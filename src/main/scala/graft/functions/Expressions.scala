package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions (SURVEY.md §4): native codegen'd
  * scalar functions for the hot paths where a Scala UDF would break
  * whole-stage codegen and serialize every row.
  */

/** Polynomial rolling-hash fingerprint: h_i = (31·h_{i-1} + c_i) mod
  * 1e9+7 over UTF-16 code units (== code points for the ASCII corpus).
  * The reference fingerprints documents/tags by content to detect
  * re-uploads; this is the codegen'd Spark-native equivalent.
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = (h * 31L + s.charAt(i).toLong) % 1000000007L
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |String $$s = $c.toString();
      |long $$h = 0L;
      |for (int $$i = 0; $$i < $$s.length(); $$i++) {
      |  $$h = ($$h * 31L + (long) $$s.charAt($$i)) % 1000000007L;
      |}
      |${ev.value} = $$h;
      |""".stripMargin.replace("$$", ctx.freshName("rh")))

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

/** Cosine similarity over two float-array embedding columns, computed
  * in double precision in one fused loop (no intermediate arrays, no
  * UDF serialization). Null/zero-norm inputs yield null.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(nx) * math.sqrt(ny)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.freshName("cs")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |int ${p}n = java.lang.Math.min($a.numElements(), $b.numElements());
      |double ${p}dot = 0.0; double ${p}nx = 0.0; double ${p}ny = 0.0;
      |for (int ${p}i = 0; ${p}i < ${p}n; ${p}i++) {
      |  double ${p}x = (double) $a.getFloat(${p}i);
      |  double ${p}y = (double) $b.getFloat(${p}i);
      |  ${p}dot += ${p}x * ${p}y; ${p}nx += ${p}x * ${p}x; ${p}ny += ${p}y * ${p}y;
      |}
      |if (${p}nx == 0.0 || ${p}ny == 0.0) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = ${p}dot / (java.lang.Math.sqrt(${p}nx) * java.lang.Math.sqrt(${p}ny));
      |}
      |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  import org.apache.spark.sql.graft.shim.{column, expression}

  def rolling_hash(c: Column): Column = column(RollingHash(expression(c)))
  def cosine_sim(a: Column, b: Column): Column =
    column(CosineSim(expression(a), expression(b)))
  def minhash_sig(c: Column, numHashes: Int = 64): Column =
    column(MinHashSig(expression(c), numHashes))
  def shingle_hashes(c: Column, n: Int = 3): Column =
    column(ShingleHashes(expression(c), n))
  def minhash_sig_long(c: Column, numHashes: Int = 64): Column =
    column(MinHashSigLong(expression(c), numHashes))
  def simhash64(c: Column): Column = column(SimHash64(expression(c)))

  /** Register for SQL use: `SELECT rolling_hash(text) …`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.graft.shim.registerFunction(
      spark, "rolling_hash", es => RollingHash(es.head))
    org.apache.spark.sql.graft.shim.registerFunction(
      spark, "cosine_sim", es => CosineSim(es.head, es(1)))
    org.apache.spark.sql.graft.shim.registerFunction(
      spark, "simhash64", es => SimHash64(es.head))
    org.apache.spark.sql.graft.shim.registerFunction(
      spark, "shingle_hashes", es => ShingleHashes(es.head, 3))
    org.apache.spark.sql.graft.shim.registerFunction(
      spark, "minhash_sig", es => MinHashSigLong(es.head, 64))
  }
}

/** MinHash signature over a shingle array in one fused pass: each
  * shingle is xxhash64'd ONCE, then remixed per permutation with the
  * cheap hashLong finalizer — vs. the HOF formulation
  * (`transform(seq, j -> array_min(transform(shingles, xxhash64)))`)
  * which re-hashes every string numHashes times and allocates
  * numHashes intermediate arrays per row.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val base = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      var j = 0
      while (j < numHashes) {
        val h = XXH64.hashLong(base, j.toLong)
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.freshName("mh")
    val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
    nullSafeCodeGen(ctx, ev, c => s"""
      |long[] ${p}sig = new long[$numHashes];
      |java.util.Arrays.fill(${p}sig, Long.MAX_VALUE);
      |int ${p}n = $c.numElements();
      |for (int ${p}i = 0; ${p}i < ${p}n; ${p}i++) {
      |  long ${p}base = $xxh.hashUTF8String($c.getUTF8String(${p}i), 42L);
      |  for (int ${p}j = 0; ${p}j < $numHashes; ${p}j++) {
      |    long ${p}h = $xxh.hashLong(${p}base, (long) ${p}j);
      |    if (${p}h < ${p}sig[${p}j]) ${p}sig[${p}j] = ${p}h;
      |  }
      |}
      |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(${p}sig);
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** 64-bit SimHash over a token array: one xxhash64 per token; bit k of
  * the signature is the sign of the per-bit vote sum. Bit-compatible
  * with the HOF formulation (same xxhash64 seed, same bit order) but
  * one string hash per token instead of 64.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.XXH64

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      var k = 0
      while (k < 64) {
        if (((h >>> k) & 1L) == 1L) votes(k) += 1 else votes(k) -= 1
        k += 1
      }
      i += 1
    }
    var sig = 0L
    var k = 63
    while (k >= 0) { sig = (sig << 1) | (if (votes(k) >= 0) 1L else 0L); k -= 1 }
    java.lang.Long.valueOf(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.freshName("sh")
    val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
    nullSafeCodeGen(ctx, ev, c => s"""
      |int[] ${p}v = new int[64];
      |int ${p}n = $c.numElements();
      |for (int ${p}i = 0; ${p}i < ${p}n; ${p}i++) {
      |  long ${p}h = $xxh.hashUTF8String($c.getUTF8String(${p}i), 42L);
      |  for (int ${p}k = 0; ${p}k < 64; ${p}k++) {
      |    if (((${p}h >>> ${p}k) & 1L) == 1L) ${p}v[${p}k]++; else ${p}v[${p}k]--;
      |  }
      |}
      |long ${p}sig = 0L;
      |for (int ${p}k = 63; ${p}k >= 0; ${p}k--) {
      |  ${p}sig = (${p}sig << 1) | (${p}v[${p}k] >= 0 ? 1L : 0L);
      |}
      |${ev.value} = ${p}sig;
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Distinct word-n-gram shingle hashes in one fused pass: each token
  * is xxhash64'd once, n-gram hashes are chained hashLong combines,
  * dedup is sort+unique on primitive longs. Replaces the HOF chain
  * `array_distinct(transform(sequence, concat_ws(slice(...))))`, which
  * materializes every shingle string (~0.6 ms/doc vs ~2 µs here) —
  * and downstream consumers (explode-join, MinHash) only need the
  * hash anyway.
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](m)
    var i = 0
    while (i < m) { th(i) = XXH64.hashUTF8String(arr.getUTF8String(i), 42L); i += 1 }
    val out = new Array[Long](m - n + 1)
    i = 0
    while (i <= m - n) {
      var h = th(i)
      var k = 1
      while (k < n) { h = XXH64.hashLong(th(i + k), h); k += 1 }
      out(i) = h
      i += 1
    }
    java.util.Arrays.sort(out)
    var w = 1
    i = 1
    while (i < out.length) {
      if (out(i) != out(i - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.freshName("sg")
    val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
    val gad = "org.apache.spark.sql.catalyst.util.GenericArrayData"
    nullSafeCodeGen(ctx, ev, c => s"""
      |int ${p}m = $c.numElements();
      |if (${p}m < $n) {
      |  ${ev.value} = new $gad(new long[0]);
      |} else {
      |  long[] ${p}th = new long[${p}m];
      |  for (int ${p}i = 0; ${p}i < ${p}m; ${p}i++) {
      |    ${p}th[${p}i] = $xxh.hashUTF8String($c.getUTF8String(${p}i), 42L);
      |  }
      |  long[] ${p}out = new long[${p}m - $n + 1];
      |  for (int ${p}i = 0; ${p}i <= ${p}m - $n; ${p}i++) {
      |    long ${p}h = ${p}th[${p}i];
      |    for (int ${p}k = 1; ${p}k < $n; ${p}k++) {
      |      ${p}h = $xxh.hashLong(${p}th[${p}i + ${p}k], ${p}h);
      |    }
      |    ${p}out[${p}i] = ${p}h;
      |  }
      |  java.util.Arrays.sort(${p}out);
      |  int ${p}w = 1;
      |  for (int ${p}i = 1; ${p}i < ${p}out.length; ${p}i++) {
      |    if (${p}out[${p}i] != ${p}out[${p}i - 1]) { ${p}out[${p}w] = ${p}out[${p}i]; ${p}w++; }
      |  }
      |  ${ev.value} = new $gad(java.util.Arrays.copyOf(${p}out, ${p}w));
      |}
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** MinHash signature over pre-hashed shingles (array<long>): per
  * permutation j the hash is a hashLong remix of the shingle hash.
  * Pairs with [[ShingleHashes]]; same family as [[MinHashSig]] seeds.
  */
case class MinHashSigLong(child: Expression, numHashes: Int)
    extends UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig_long"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val m = arr.numElements()
    var i = 0
    while (i < m) {
      val base = arr.getLong(i)
      var j = 0
      while (j < numHashes) {
        val h = XXH64.hashLong(base, j.toLong)
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.freshName("ml")
    val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
    nullSafeCodeGen(ctx, ev, c => s"""
      |long[] ${p}sig = new long[$numHashes];
      |java.util.Arrays.fill(${p}sig, Long.MAX_VALUE);
      |int ${p}m = $c.numElements();
      |for (int ${p}i = 0; ${p}i < ${p}m; ${p}i++) {
      |  long ${p}base = $c.getLong(${p}i);
      |  for (int ${p}j = 0; ${p}j < $numHashes; ${p}j++) {
      |    long ${p}h = $xxh.hashLong(${p}base, (long) ${p}j);
      |    if (${p}h < ${p}sig[${p}j]) ${p}sig[${p}j] = ${p}h;
      |  }
      |}
      |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(${p}sig);
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigLong =
    copy(child = newChild)
}
