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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // fresh-name prefix per call site: two rolling_hash calls in one
    // codegen scope must not redeclare the same locals
    val p = ctx.freshName("rh")
    nullSafeCodeGen(ctx, ev, c => s"""
      |String ${p}s = $c.toString();
      |long ${p}h = 0L;
      |for (int ${p}i = 0; ${p}i < ${p}s.length(); ${p}i++) {
      |  ${p}h = (${p}h * 31L + (long) ${p}s.charAt(${p}i)) % 1000000007L;
      |}
      |${ev.value} = ${p}h;
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

/** One-pass BPE-ish token-cost estimate: the total
  * Σ (segment_length + 3) div 4 over the segmentation
  * `[A-Za-z]+ | [0-9]+ | [^A-Za-z0-9 ]` — the d38 fertility
  * segmenter — WITHOUT materializing the match array.
  * `regexp_extract_all` + `aggregate` allocates every segment as a
  * string per document (measured as the data-linear term at the
  * 100× probe, SCALE_r11); this expression is the same arithmetic
  * as a fused byte scan: letters and digits extend maximal runs
  * costing ⌈len/4⌉, every other non-space CODE POINT (code point,
  * not UTF-16 unit — regex classes match code points, and the
  * DuckDB oracle's RE2 agrees) costs 1, spaces are free.
  */
case class BpeCountApprox(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_count_approx"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == ' ') i += 1
      else if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) {
        var len = 0
        while (i < n && {
          val x = s.charAt(i)
          (x >= 'A' && x <= 'Z') || (x >= 'a' && x <= 'z')
        }) { len += 1; i += 1 }
        acc += (len + 3) / 4
      } else if (c >= '0' && c <= '9') {
        var len = 0
        while (i < n && { val x = s.charAt(i); x >= '0' && x <= '9' }) {
          len += 1; i += 1
        }
        acc += (len + 3) / 4
      } else {
        // one cost unit per code point: a surrogate PAIR is one match
        acc += 1
        i += (if (Character.isHighSurrogate(c) && i + 1 < n &&
          Character.isLowSurrogate(s.charAt(i + 1))) 2 else 1)
      }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.freshName("bpe")
    nullSafeCodeGen(ctx, ev, c => s"""
      |String ${p}s = $c.toString();
      |long ${p}acc = 0L;
      |int ${p}i = 0;
      |int ${p}n = ${p}s.length();
      |while (${p}i < ${p}n) {
      |  char ${p}c = ${p}s.charAt(${p}i);
      |  if (${p}c == ' ') { ${p}i++; }
      |  else if ((${p}c >= 'A' && ${p}c <= 'Z') || (${p}c >= 'a' && ${p}c <= 'z')) {
      |    int ${p}len = 0;
      |    while (${p}i < ${p}n) {
      |      char ${p}x = ${p}s.charAt(${p}i);
      |      if (!((${p}x >= 'A' && ${p}x <= 'Z') || (${p}x >= 'a' && ${p}x <= 'z'))) break;
      |      ${p}len++; ${p}i++;
      |    }
      |    ${p}acc += (${p}len + 3) / 4;
      |  } else if (${p}c >= '0' && ${p}c <= '9') {
      |    int ${p}len = 0;
      |    while (${p}i < ${p}n) {
      |      char ${p}x = ${p}s.charAt(${p}i);
      |      if (!(${p}x >= '0' && ${p}x <= '9')) break;
      |      ${p}len++; ${p}i++;
      |    }
      |    ${p}acc += (${p}len + 3) / 4;
      |  } else {
      |    ${p}acc += 1L;
      |    ${p}i += (Character.isHighSurrogate(${p}c) && ${p}i + 1 < ${p}n &&
      |      Character.isLowSurrogate(${p}s.charAt(${p}i + 1))) ? 2 : 1;
      |  }
      |}
      |${ev.value} = ${p}acc;
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): BpeCountApprox =
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

  // element type only — containsNull differs once a column round-trips
  // through a table, and builder output never holds nulls anyway
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cosine_sim requires two ARRAY<FLOAT> columns, got " +
            s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // dimension mismatch is an upstream data bug — null, never a
    // plausible-looking similarity over the common prefix
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
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
      |if ($a.numElements() != $b.numElements()) {
      |  ${ev.isNull} = true;
      |} else {
      |  int ${p}n = $a.numElements();
      |  double ${p}dot = 0.0; double ${p}nx = 0.0; double ${p}ny = 0.0;
      |  for (int ${p}i = 0; ${p}i < ${p}n; ${p}i++) {
      |    double ${p}x = (double) $a.getFloat(${p}i);
      |    double ${p}y = (double) $b.getFloat(${p}i);
      |    ${p}dot += ${p}x * ${p}y; ${p}nx += ${p}x * ${p}x; ${p}ny += ${p}y * ${p}y;
      |  }
      |  if (${p}nx == 0.0 || ${p}ny == 0.0) {
      |    ${ev.isNull} = true;
      |  } else {
      |    ${ev.value} = ${p}dot / (java.lang.Math.sqrt(${p}nx) * java.lang.Math.sqrt(${p}ny));
      |  }
      |}
      |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Content-defined chunk boundaries (m7's gear hash, SURVEY §2.8):
  * 1-based chunk END positions over a binary blob — position i+1 is a
  * cut iff the mixed 2-byte-window hash of (b[i-1], b[i]) lands in
  * the low 1/64 of the 31-bit range (the HIGH-bit cut; mod-64 on a
  * multiplicative hash reads the unmixed low bits and degenerates),
  * with the blob end always the final cut. Emitting boundaries as an
  * array keeps the whole CDC pass inside whole-stage codegen: cuts →
  * posexplode → substring/sha2, no mapPartitions, no UDF.
  */
case class GearCuts(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "gear_cuts"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"gear_cuts requires BINARY, got ${t.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    val n = b.length
    val cuts = new Array[Int](n)
    var w = 0
    var i = 1
    while (i < n) {
      val h = (((b(i - 1) & 0xffL) * 256L + (b(i) & 0xffL) + 1L) *
        2654435761L) % 2147483648L
      if (h < 33554432L) { cuts(w) = i + 1; w += 1 }
      i += 1
    }
    if (n > 0 && (w == 0 || cuts(w - 1) != n)) { cuts(w) = n; w += 1 }
    new GenericArrayData(java.util.Arrays.copyOf(cuts, w))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.freshName("gc")
    val gad = "org.apache.spark.sql.catalyst.util.GenericArrayData"
    nullSafeCodeGen(ctx, ev, c => s"""
      |byte[] ${p}b = $c;
      |int ${p}n = ${p}b.length;
      |int[] ${p}cuts = new int[${p}n];
      |int ${p}w = 0;
      |for (int ${p}i = 1; ${p}i < ${p}n; ${p}i++) {
      |  long ${p}h = ((((long) (${p}b[${p}i - 1] & 0xFF)) * 256L +
      |    (${p}b[${p}i] & 0xFF) + 1L) * 2654435761L) % 2147483648L;
      |  if (${p}h < 33554432L) { ${p}cuts[${p}w++] = ${p}i + 1; }
      |}
      |if (${p}n > 0 && (${p}w == 0 || ${p}cuts[${p}w - 1] != ${p}n)) {
      |  ${p}cuts[${p}w++] = ${p}n;
      |}
      |${ev.value} = new $gad(java.util.Arrays.copyOf(${p}cuts, ${p}w));
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): GearCuts =
    copy(child = newChild)
}

/** One-pass CDC chunk MANIFEST (m7): GearCuts' boundary rule and the
  * per-chunk SHA-256 fused into a single traversal emitting
  * array<struct<off,len,sha>> — the blob is read once and never
  * carried through the downstream explode (the cuts-then-substring
  * form recopies the blob once per chunk through the generator:
  * measured 0.71 s vs 0.49 s at sf0.1). MessageDigest lives in
  * per-instance/mutable state, reused across rows.
  */
case class GearChunks(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("off", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false),
    StructField("sha", BinaryType, nullable = false))), containsNull = false)
  override def prettyName: String = "gear_chunks"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"gear_chunks requires BINARY, got ${t.catalogString}")
    }

  @transient private lazy val md =
    java.security.MessageDigest.getInstance("SHA-256")

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    val n = b.length
    val cuts = new Array[Int](n)
    var w = 0
    var i = 1
    while (i < n) {
      val h = (((b(i - 1) & 0xffL) * 256L + (b(i) & 0xffL) + 1L) *
        2654435761L) % 2147483648L
      if (h < 33554432L) { cuts(w) = i + 1; w += 1 }
      i += 1
    }
    if (n > 0 && (w == 0 || cuts(w - 1) != n)) { cuts(w) = n; w += 1 }
    val rows = new Array[Any](w)
    var prev = 0
    var k = 0
    while (k < w) {
      val e = cuts(k)
      md.reset()
      md.update(b, prev, e - prev)
      rows(k) = new GenericInternalRow(
        Array[Any](prev + 1, e - prev, md.digest()))
      prev = e
      k += 1
    }
    new GenericArrayData(rows)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.freshName("gch")
    val mdRef = ctx.addMutableState("java.security.MessageDigest", "gearMd",
      v => s"""try { $v = java.security.MessageDigest.getInstance("SHA-256"); }
              |catch (Exception e) { throw new RuntimeException(e); }""".stripMargin)
    val gad = "org.apache.spark.sql.catalyst.util.GenericArrayData"
    val gir = "org.apache.spark.sql.catalyst.expressions.GenericInternalRow"
    nullSafeCodeGen(ctx, ev, c => s"""
      |byte[] ${p}b = $c;
      |int ${p}n = ${p}b.length;
      |int[] ${p}cuts = new int[${p}n];
      |int ${p}w = 0;
      |for (int ${p}i = 1; ${p}i < ${p}n; ${p}i++) {
      |  long ${p}h = ((((long) (${p}b[${p}i - 1] & 0xFF)) * 256L +
      |    (${p}b[${p}i] & 0xFF) + 1L) * 2654435761L) % 2147483648L;
      |  if (${p}h < 33554432L) { ${p}cuts[${p}w++] = ${p}i + 1; }
      |}
      |if (${p}n > 0 && (${p}w == 0 || ${p}cuts[${p}w - 1] != ${p}n)) {
      |  ${p}cuts[${p}w++] = ${p}n;
      |}
      |Object[] ${p}rows = new Object[${p}w];
      |int ${p}prev = 0;
      |for (int ${p}k = 0; ${p}k < ${p}w; ${p}k++) {
      |  int ${p}e = ${p}cuts[${p}k];
      |  $mdRef.reset();
      |  $mdRef.update(${p}b, ${p}prev, ${p}e - ${p}prev);
      |  ${p}rows[${p}k] = new $gir(new Object[] {
      |    java.lang.Integer.valueOf(${p}prev + 1),
      |    java.lang.Integer.valueOf(${p}e - ${p}prev),
      |    $mdRef.digest() });
      |  ${p}prev = ${p}e;
      |}
      |${ev.value} = new $gad(${p}rows);
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): GearChunks =
    copy(child = newChild)
}

/** Hive-path partition-value UNESCAPE (`%XX` hex sequences → chars) —
  * the read half of the convention `DataFrameWriter.partitionBy`
  * writes value dirs with (Spark's `ExternalCatalogUtils
  * .escapePathName`, the Hive layout rule): `country=South%3A1` reads
  * back as `South:1`. Deliberately NOT `url_decode`: the Hive escape
  * set never encodes `+`, so URL decoding would corrupt a literal
  * `a+b` into `a b`. Used by the partition-restore projection on
  * string-partitioned tables — per-row, hence codegen'd; the
  * no-`%` fast path returns the input UTF8String untouched.
  */
case class PathUnescape(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "path_unescape"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"path_unescape needs a string child, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    PathUnescape.unescape(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PathUnescape.unescape($c)")

  override protected def withNewChildInternal(newChild: Expression): PathUnescape =
    copy(child = newChild)
}

object PathUnescape {
  /** Static entry point the generated code calls. */
  def unescape(u: UTF8String): UTF8String = {
    val s = u.toString
    if (s.indexOf('%') < 0) u
    else UTF8String.fromString(
      org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .unescapePathName(s))
  }
}

/** Exact intersection COUNT of two SORTED-DISTINCT long arrays via a
  * zero-allocation merge, with a THRESHOLD EARLY-EXIT: once
  * `count + min(remaining_a, remaining_b) < needed` the pair can no
  * longer reach the needed overlap and the merge bails with the
  * count so far (any value below `needed` — callers filter on a
  * threshold that `needed` under-estimates, so reported-below-needed
  * pairs are exactly the filtered-out pairs and surviving pairs
  * always run the merge to completion, i.e. their count is EXACT).
  * This replaces `size(array_intersect(a, b))` on the d2/d36
  * verification hot path: ArrayIntersect's codegen builds an
  * OpenHashSet and an output array PER ROW — millions of candidate
  * pairs of ~40-element arrays spend more time allocating than
  * comparing. Inputs MUST be sorted ascending and duplicate-free
  * (ShingleHashes' output contract); `needed ≤ 0` disables the bail
  * (full exact count).
  */
case class SortedIntersectCount(left: Expression, right: Expression,
                                needed: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def first: Expression = left
  override def second: Expression = right
  override def third: Expression = needed
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType, needed.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sorted_intersect_count requires (ARRAY<BIGINT>, ARRAY<BIGINT>, " +
            s"BIGINT), got $other")
    }

  override def nullSafeEval(a: Any, b: Any, n: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    SortedIntersectCount.count(x, y, n.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, n) =>
      s"graft.functions.SortedIntersectCount.count($a, $b, $n)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): SortedIntersectCount =
    copy(left = newFirst, right = newSecond, needed = newThird)
}

object SortedIntersectCount {
  /** Static entry the generated code calls. */
  def count(a: org.apache.spark.sql.catalyst.util.ArrayData,
            b: org.apache.spark.sql.catalyst.util.ArrayData,
            needed: Long): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      if (needed > 0) {
        val rem = math.min(na - i, nb - j)
        if (c + rem < needed) return c // can no longer reach `needed`
      }
      val va = a.getLong(i)
      val vb = b.getLong(j)
      if (va == vb) { c += 1; i += 1; j += 1 }
      else if (va < vb) i += 1
      else j += 1
    }
    c
  }
}

object GraftFunctions {
  import org.apache.spark.sql.graft.shim.{column, expression}

  def rolling_hash(c: Column): Column = column(RollingHash(expression(c)))
  def path_unescape(c: Column): Column = column(PathUnescape(expression(c)))
  def bpe_count_approx(c: Column): Column =
    column(BpeCountApprox(expression(c)))
  def gear_cuts(c: Column): Column = column(GearCuts(expression(c)))
  def gear_chunks(c: Column): Column = column(GearChunks(expression(c)))
  def cosine_sim(a: Column, b: Column): Column =
    column(CosineSim(expression(a), expression(b)))
  def minhash_sig(c: Column, numHashes: Int = 64): Column =
    column(MinHashSig(expression(c), numHashes))
  def shingle_hashes(c: Column, n: Int = 3): Column =
    column(ShingleHashes(expression(c), n))
  def shingle_hashes_pos(c: Column, n: Int = 3): Column =
    column(ShingleHashesPos(expression(c), n))
  def minhash_sig_long(c: Column, numHashes: Int = 64): Column =
    column(MinHashSigLong(expression(c), numHashes))
  def simhash64(c: Column): Column = column(SimHash64(expression(c)))
  def strided_dhash(c: Column, bits: Int): Column =
    column(StridedDHash(expression(c), bits))
  def long_dot(a: Column, b: Column): Column =
    column(LongDot(expression(a), expression(b)))
  def kmv_distinct(c: Column, k: Int = 256): Column =
    column(KmvDistinct(expression(c), k)
      .toAggregateExpression(isDistinct = false))
  def top_k(score: Column, id: Column, k: Int): Column =
    column(TopKByScore(expression(score), expression(id), k)
      .toAggregateExpression(isDistinct = false))
  def capped_collect_pairs(id: Column, sz: Column, cap: Int): Column =
    column(CappedCollectPairs(expression(id), expression(sz), cap)
      .toAggregateExpression(isDistinct = false))
  def capped_collect_pos(id: Column, sz: Column, pos: Column,
                         cap: Int): Column =
    column(CappedCollectPos(expression(id), expression(sz),
      expression(pos), cap)
      .toAggregateExpression(isDistinct = false))
  def sorted_intersect_count(a: Column, b: Column, needed: Column): Column =
    column(SortedIntersectCount(expression(a), expression(b),
      expression(needed)))
  def bloom_agg(c: Column, numBits: Int = 1 << 20, numHashes: Int = 5): Column =
    column(BloomBuildAgg(expression(c), numBits, numHashes)
      .toAggregateExpression(isDistinct = false))
  def bloom_contains(bits: Column, v: Column): Column =
    column(BloomContains(expression(bits), expression(v)))
  def cms_agg(c: Column, depth: Int = 4, width: Int = 8192): Column =
    column(CmsBuildAgg(expression(c), depth, width)
      .toAggregateExpression(isDistinct = false))
  def cms_estimate(counts: Column, v: Column): Column =
    column(CmsEstimate(expression(counts), expression(v)))

  // ---- SQL surface: ONE builder list for both registration paths
  // (session-level register() and the GraftExtensions injection), so
  // they cannot drift. Builders validate arity — a silently-dropped
  // third argument (`topk_by_score(s, id, 10)` quietly returning
  // top-5) is a wrong-results bug — and optional tuning parameters
  // must be integer literals.

  private def arity(name: String, es: Seq[Expression], allowed: Int*): Unit =
    if (!allowed.contains(es.length))
      throw new IllegalArgumentException(
        s"$name expects ${allowed.mkString(" or ")} argument(s), got ${es.length}")

  private def litInt(name: String, e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, LongType) => v.toInt
    case _ => throw new IllegalArgumentException(
      s"$name: $what must be an integer literal")
  }

  /** (name, usage, builder) — aggregates register too: an
    * AggregateExpression IS an Expression, so SQL users get
    * `SELECT kmv_distinct(k) … GROUP BY …`.
    */
  val sqlFunctions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("rolling_hash", "rolling_hash(str) - polynomial content fingerprint",
      es => { arity("rolling_hash", es, 1); RollingHash(es.head) }),
    ("gear_cuts", "gear_cuts(bin) - content-defined chunk end positions",
      es => { arity("gear_cuts", es, 1); GearCuts(es.head) }),
    ("gear_chunks", "gear_chunks(bin) - CDC chunk manifest (off, len, sha)",
      es => { arity("gear_chunks", es, 1); GearChunks(es.head) }),
    ("cosine_sim", "cosine_sim(a, b) - cosine of two float arrays",
      es => { arity("cosine_sim", es, 2); CosineSim(es.head, es(1)) }),
    ("simhash64", "simhash64(tokens) - 64-bit SimHash",
      es => { arity("simhash64", es, 1); SimHash64(es.head) }),
    ("shingle_hashes", "shingle_hashes(tokens[, n]) - distinct n-gram hashes (default 3)",
      es => { arity("shingle_hashes", es, 1, 2)
        ShingleHashes(es.head,
          if (es.length > 1) litInt("shingle_hashes", es(1), "n") else 3) }),
    ("shingle_hashes_pos", "shingle_hashes_pos(tokens[, n]) - positional n-gram hashes (default 3)",
      es => { arity("shingle_hashes_pos", es, 1, 2)
        ShingleHashesPos(es.head,
          if (es.length > 1) litInt("shingle_hashes_pos", es(1), "n") else 3) }),
    ("minhash_sig", "minhash_sig(shingle_hashes[, perms]) - MinHash signature (default 64)",
      es => { arity("minhash_sig", es, 1, 2)
        MinHashSigLong(es.head,
          if (es.length > 1) litInt("minhash_sig", es(1), "perms") else 64) }),
    ("kmv_distinct", "kmv_distinct(col[, k]) - KMV distinct-count sketch (default k=256)",
      es => { arity("kmv_distinct", es, 1, 2)
        KmvDistinct(es.head,
          if (es.length > 1) litInt("kmv_distinct", es(1), "k") else 256)
          .toAggregateExpression(isDistinct = false) }),
    ("topk_by_score", "topk_by_score(score, id[, k]) - top-k (score,id) pairs per group (default 5)",
      es => { arity("topk_by_score", es, 2, 3)
        TopKByScore(es.head, es(1),
          if (es.length > 2) litInt("topk_by_score", es(2), "k") else 5)
          .toAggregateExpression(isDistinct = false) }),
    ("bloom_agg", "bloom_agg(col[, numBits, numHashes]) - Bloom filter build (default 2^20, 5)",
      es => { arity("bloom_agg", es, 1, 3)
        BloomBuildAgg(es.head,
          if (es.length > 1) litInt("bloom_agg", es(1), "numBits") else 1 << 20,
          if (es.length > 2) litInt("bloom_agg", es(2), "numHashes") else 5)
          .toAggregateExpression(isDistinct = false) }),
    ("bloom_contains", "bloom_contains(bits, v) - Bloom membership probe",
      es => { arity("bloom_contains", es, 2); BloomContains(es.head, es(1)) }),
    ("cms_agg", "cms_agg(col[, depth, width]) - Count-Min sketch build (default 4, 8192)",
      es => { arity("cms_agg", es, 1, 3)
        CmsBuildAgg(es.head,
          if (es.length > 1) litInt("cms_agg", es(1), "depth") else 4,
          if (es.length > 2) litInt("cms_agg", es(2), "width") else 8192)
          .toAggregateExpression(isDistinct = false) }),
    ("cms_estimate", "cms_estimate(counts, v) - Count-Min frequency estimate",
      es => { arity("cms_estimate", es, 2); CmsEstimate(es.head, es(1)) }),
  )

  /** Register for SQL use: `SELECT rolling_hash(text) …`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    sqlFunctions.foreach { case (name, _, builder) =>
      org.apache.spark.sql.graft.shim.registerFunction(spark, name, builder)
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

  require(numHashes > 0, "numHashes must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_sig requires ARRAY<STRING>, got ${t.catalogString}")
    }


  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      // null elements hash as the empty string in BOTH paths (a
      // GenericArrayData eval would otherwise NPE while unsafe
      // codegen read a zero-length slot — a silent divergence)
      val u = arr.getUTF8String(i)
      val base = XXH64.hashUTF8String(
        if (u == null) UTF8String.EMPTY_UTF8 else u, 42L)
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
      |  long ${p}base = $xxh.hashUTF8String($c.isNullAt(${p}i)
      |    ? org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
      |    : $c.getUTF8String(${p}i), 42L);
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

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash64 requires ARRAY<STRING>, got ${t.catalogString}")
    }


  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val u = arr.getUTF8String(i) // null element -> empty (see MinHashSig)
      val h = XXH64.hashUTF8String(
        if (u == null) UTF8String.EMPTY_UTF8 else u, 42L)
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
      |  long ${p}h = $xxh.hashUTF8String($c.isNullAt(${p}i)
      |    ? org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
      |    : $c.getUTF8String(${p}i), 42L);
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

/** Strided dHash (m8's perceptual gradient hash) in ONE pass over the
  * string: bit i compares the code points at 1-based code-point
  * positions min(1 + i·stride, len) and min(1 + (i+1)·stride, len),
  * stride = max(1, len div (bits+1)) — bit-identical to the SQL form
  *   `if(ascii(substring(text, p_i, 1)) < ascii(substring(text,
  *    p_{i+1}, 1)), 1<<i, 0)` summed,
  * which it replaces: the HOF chain re-walked the string from the
  * start for every one of the 2·bits substring() calls (O(bits·len)
  * per row) and its generated aggregate ballooned Janino compile
  * time as the adaptive width grew — this expression walks the
  * string once, recording the bits+1 sampled code points as it
  * passes them (positions are nondecreasing), then compares
  * neighbors: O(len + bits), tiny codegen. Empty text hashes to 0
  * (every sample reads 0, mirroring ascii('') = 0).
  */
case class StridedDHash(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits >= 1 && bits <= 62, s"bits must be in [1, 62], got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "strided_dhash"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val len = s.codePointCount(0, s.length)
    val samples = new Array[Int](bits + 1)
    if (len > 0) {
      val stride = math.max(1, len / (bits + 1))
      var cp = 0; var ci = 0; var j = 0
      while (ci < s.length && j <= bits) {
        val code = s.codePointAt(ci)
        cp += 1
        // positions are nondecreasing and clamp at len, so every j
        // whose clamped position equals the current code point index
        // (including all remaining j once cp == len) fills here
        while (j <= bits && math.min(1 + j * stride, len) == cp) {
          samples(j) = code; j += 1
        }
        ci += Character.charCount(code)
      }
    }
    var h = 0L
    var i = 0
    while (i < bits) {
      if (samples(i) < samples(i + 1)) h |= (1L << i)
      i += 1
    }
    java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.freshName("dh")
    nullSafeCodeGen(ctx, ev, c => s"""
      |String ${p}s = $c.toString();
      |int ${p}len = ${p}s.codePointCount(0, ${p}s.length());
      |int[] ${p}smp = new int[$bits + 1];
      |if (${p}len > 0) {
      |  int ${p}stride = Math.max(1, ${p}len / ($bits + 1));
      |  int ${p}cp = 0; int ${p}ci = 0; int ${p}j = 0;
      |  while (${p}ci < ${p}s.length() && ${p}j <= $bits) {
      |    int ${p}code = ${p}s.codePointAt(${p}ci);
      |    ${p}cp++;
      |    while (${p}j <= $bits &&
      |           Math.min(1 + ${p}j * ${p}stride, ${p}len) == ${p}cp) {
      |      ${p}smp[${p}j] = ${p}code; ${p}j++;
      |    }
      |    ${p}ci += Character.charCount(${p}code);
      |  }
      |}
      |long ${p}h = 0L;
      |for (int ${p}i = 0; ${p}i < $bits; ${p}i++) {
      |  if (${p}smp[${p}i] < ${p}smp[${p}i + 1]) ${p}h |= (1L << ${p}i);
      |}
      |${ev.value} = ${p}h;
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): StridedDHash =
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

  require(n > 0, "shingle width n must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shingle_hashes requires ARRAY<STRING>, got ${t.catalogString}")
    }


  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](m)
    var i = 0
    while (i < m) { // null element -> empty (see MinHashSig)
      val u = arr.getUTF8String(i)
      th(i) = XXH64.hashUTF8String(
        if (u == null) UTF8String.EMPTY_UTF8 else u, 42L)
      i += 1
    }
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
      |    ${p}th[${p}i] = $xxh.hashUTF8String($c.isNullAt(${p}i)
      |      ? org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
      |      : $c.getUTF8String(${p}i), 42L);
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

/** POSITIONAL n-gram hashes: [[ShingleHashes]]'s per-token-hash +
  * rolling-combiner core with the final sort/dedup removed — element
  * i is the hash of the n-gram starting at token i (duplicates kept,
  * order preserved), so span-level operators (d22) can posexplode it
  * into (pos, hash) postings with ZERO shingle-string
  * materialization. Deliberately a sibling class, not a flag on
  * ShingleHashes: the two have different output contracts (set vs
  * sequence) and fusing them would put a branch in both codegen
  * bodies.
  */
case class ShingleHashesPos(child: Expression, n: Int) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  require(n > 0, "shingle width n must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes_pos"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shingle_hashes_pos requires ARRAY<STRING>, got ${t.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](m)
    var i = 0
    while (i < m) { // null element -> empty (see MinHashSig)
      val u = arr.getUTF8String(i)
      th(i) = XXH64.hashUTF8String(
        if (u == null) UTF8String.EMPTY_UTF8 else u, 42L)
      i += 1
    }
    val out = new Array[Long](m - n + 1)
    i = 0
    while (i <= m - n) {
      var h = th(i)
      var k = 1
      while (k < n) { h = XXH64.hashLong(th(i + k), h); k += 1 }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.freshName("sgp")
    val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
    val gad = "org.apache.spark.sql.catalyst.util.GenericArrayData"
    nullSafeCodeGen(ctx, ev, c => s"""
      |int ${p}m = $c.numElements();
      |if (${p}m < $n) {
      |  ${ev.value} = new $gad(new long[0]);
      |} else {
      |  long[] ${p}th = new long[${p}m];
      |  for (int ${p}i = 0; ${p}i < ${p}m; ${p}i++) {
      |    ${p}th[${p}i] = $xxh.hashUTF8String($c.isNullAt(${p}i)
      |      ? org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
      |      : $c.getUTF8String(${p}i), 42L);
      |  }
      |  long[] ${p}out = new long[${p}m - $n + 1];
      |  for (int ${p}i = 0; ${p}i <= ${p}m - $n; ${p}i++) {
      |    long ${p}h = ${p}th[${p}i];
      |    for (int ${p}k = 1; ${p}k < $n; ${p}k++) {
      |      ${p}h = $xxh.hashLong(${p}th[${p}i + ${p}k], ${p}h);
      |    }
      |    ${p}out[${p}i] = ${p}h;
      |  }
      |  ${ev.value} = new $gad(${p}out);
      |}
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesPos =
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

  require(numHashes > 0, "numHashes must be positive")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_sig_long requires ARRAY<BIGINT>, got ${t.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig_long"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val m = arr.numElements()
    var i = 0
    while (i < m) {
      // null element -> 0L in both paths (see MinHashSig note)
      val base = if (arr.isNullAt(i)) 0L else arr.getLong(i)
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
      |  long ${p}base = $c.isNullAt(${p}i) ? 0L : $c.getLong(${p}i);
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

/** KMV (bottom-k) distinct-count sketch as a TypedImperativeAggregate:
  * keeps the k smallest unsigned xxhash64 values; estimate is
  * (k-1) / fraction-of-hash-space covered by the kth minimum.
  * Deterministic (hash-based, no RNG), mergeable across partitions —
  * the custom-aggregate analog of approx_count_distinct with a
  * tunable, explainable sketch.
  */
case class KmvDistinct(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k > 0, "k must be positive")

  // misuse (non-long column) must fail at analysis, not as a runtime
  // ClassCastException in update() (AbstractDataType is private[sql],
  // so checkInputDataTypes instead of ExpectsInputTypes)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kmv_distinct requires a BIGINT column, got ${child.dataType.catalogString}")

  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.sql.catalyst.InternalRow

  // hashes are stored biased by Long.MinValue so the natural signed
  // ordering equals unsigned hash order (keeps the buffer a plain
  // TreeSet — a custom Comparator would have to be Serializable).
  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    buf.add(h ^ Long.MinValue)
    if (buf.size > k) buf.remove(buf.last())
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    // double-hash: a single hashLong over small sequential ints left a
    // consistent +10-17% bias in the kth-minimum (poor low-order
    // mixing); the second round brings error within the ~6% rsd bound
    if (v != null) add(buf, XXH64.hashLong(XXH64.hashLong(v.asInstanceOf[Long], 42L), 7L))
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
                     b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    // b2 already holds biased values; insert without re-biasing
    while (it.hasNext) {
      b1.add(it.next())
      if (b1.size > k) b1.remove(b1.last())
    }
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val n = buf.size
    if (n < k) n.toLong // fewer distinct values than k: sketch is exact
    else {
      // kth-minimum as a fraction of the unsigned 64-bit space; the
      // stored value is biased (u - 2^63), so frac = b/2^64 + 1/2
      val b = buf.last().longValue()
      val frac = b.toDouble / 1.8446744073709552e19 + 0.5
      math.round((k - 1) / frac)
    }
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong) ; i += 1 }
    buf
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(o: Int): KmvDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvDistinct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KmvDistinct = copy(child = c.head)
  override def prettyName: String = "kmv_distinct"
}

/** Bounded top-k by score: keeps the k best (score DESC, id ASC)
  * pairs, emitted as a rank-ordered array<struct<score,id>>.
  *
  * This is the scale-safe replacement for `row_number() OVER
  * (PARTITION BY qid ORDER BY score DESC) <= k`: with Q distinct
  * query ids, the window form shuffles every scored row onto Q
  * partitions (each reducer receives the full corpus at 100 TB),
  * while this aggregate is partially applied map-side — each input
  * partition forwards at most k rows per qid, so the exchange moves
  * O(partitions · Q · k) buffers regardless of corpus size. Same
  * shape as Spark's own `TakeOrderedAndProject`, but per group.
  *
  * Deterministic: total order (score DESC, id ASC); null scores are
  * skipped. Mergeable, so it also composes under AQE re-plans.
  */
case class TopKByScore(
    score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[(Double, Long)]] {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  private type Buf = scala.collection.mutable.ArrayBuffer[(Double, Long)]

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"topk_by_score requires (DOUBLE score, BIGINT id), got " +
          s"(${score.dataType.catalogString}, ${id.dataType.catalogString})")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score, id)

  override def createAggregationBuffer(): Buf = new Buf

  /** keep the k best; amortized O(1) per row via lazy compaction. */
  private def compact(b: Buf): Buf = {
    if (b.length > k) {
      val kept = b.sortBy(t => (-t._1, t._2)).take(k)
      b.clear()
      b ++= kept
    }
    b
  }

  override def update(b: Buf, input: InternalRow): Buf = {
    val sv = score.eval(input)
    val iv = id.eval(input)
    if (sv != null && iv != null) {
      b += ((sv.asInstanceOf[Double], iv.asInstanceOf[Long]))
      if (b.length >= 4 * k) compact(b)
    }
    b
  }

  override def merge(a: Buf, b: Buf): Buf = { a ++= b; compact(a) }

  override def eval(b: Buf): Any = {
    val kept = b.sortBy(t => (-t._1, t._2)).take(k)
    new GenericArrayData(kept.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i)): InternalRow
    }.toArray)
  }

  override def serialize(b: Buf): Array[Byte] = {
    compact(b) // never ship more than k pairs
    val bb = java.nio.ByteBuffer.allocate(4 + b.length * 16)
    bb.putInt(b.length)
    b.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = createAggregationBuffer()
    var i = 0
    while (i < n) { b += ((bb.getDouble, bb.getLong)); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TopKByScore =
    copy(score = c(0), id = c(1))
  override def prettyName: String = "topk_by_score"
}

/** Size-capped posting-list collector: gathers (id, sz) pairs per
  * group but STOPS BUFFERING at cap+1 entries and evaluates to null
  * for any group that exceeded the cap. This is what makes a
  * document-frequency stop-list memory-safe: a boilerplate shingle
  * shared by 10⁸ documents costs a cap+1-entry buffer here, where
  * `collect_list` + post-filter would materialize all 10⁸ entries in
  * one aggregation buffer before the filter could drop them.
  *
  * Overflow state survives serialize/merge (an overflowed buffer
  * ships as cap+1 entries, keeping merged sizes > cap), so partial
  * aggregation stays correct. Output order is insertion order —
  * consumers must not depend on it (d2 re-aggregates per pair).
  */
case class CappedCollectPairs(
    id: Expression, sz: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[(Long, Long)]] {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  private type Buf = scala.collection.mutable.ArrayBuffer[(Long, Long)]

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (id.dataType == LongType && sz.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"capped_collect_pairs requires (BIGINT, BIGINT), got " +
          s"(${id.dataType.catalogString}, ${sz.dataType.catalogString})")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("sz", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(id, sz)

  override def createAggregationBuffer(): Buf = new Buf

  override def update(b: Buf, input: InternalRow): Buf = {
    val iv = id.eval(input)
    val sv = sz.eval(input)
    // past cap+1 the group is already doomed — stop accumulating
    if (iv != null && sv != null && b.length <= cap)
      b += ((iv.asInstanceOf[Long], sv.asInstanceOf[Long]))
    b
  }

  override def merge(a: Buf, b: Buf): Buf = {
    val room = (cap + 1) - a.length
    if (room > 0) a ++= b.take(room)
    a
  }

  override def eval(b: Buf): Any =
    if (b.length > cap) null
    else new GenericArrayData(b.map { case (i, s) =>
      new GenericInternalRow(Array[Any](i, s)): InternalRow
    }.toArray)

  override def serialize(b: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + b.length * 16)
    bb.putInt(b.length)
    b.foreach { case (i, s) => bb.putLong(i); bb.putLong(s) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = createAggregationBuffer()
    var i = 0
    while (i < n) { b += ((bb.getLong, bb.getLong)); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): CappedCollectPairs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CappedCollectPairs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): CappedCollectPairs =
    copy(id = c(0), sz = c(1))
  override def prettyName: String = "capped_collect_pairs"
}

/** [[CappedCollectPairs]] with a third carried field — the element's
  * POSITION inside the document's sorted shingle array — for the
  * PPJoin POSITIONAL filter (Xiao et al. WWW'08): a candidate pair
  * first meeting at prefix positions (i, j) can share at most
  * min(i, j) + min(|A| − i, |B| − j) elements (common elements before
  * the meeting point number ≤ min(i,j) − 1; from it on ≤ 1 +
  * min(remaining)), so pairs whose bound is below the overlap
  * threshold α = ⌈t·(|A|+|B|)/(1+t)⌉ are killed BEFORE the
  * array_intersect verification. Same capped-buffer discipline:
  * groups past `cap` evaluate to null without buffering more than
  * cap+1 entries.
  */
case class CappedCollectPos(
    id: Expression, sz: Expression, pos: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]] {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  private type Buf = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (id.dataType == LongType && sz.dataType == LongType &&
        pos.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"capped_collect_pos requires (BIGINT, BIGINT, BIGINT), got " +
          s"(${id.dataType.catalogString}, ${sz.dataType.catalogString}, " +
          s"${pos.dataType.catalogString})")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("sz", LongType, nullable = false),
    StructField("pos", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(id, sz, pos)

  override def createAggregationBuffer(): Buf = new Buf

  override def update(b: Buf, input: InternalRow): Buf = {
    val iv = id.eval(input)
    val sv = sz.eval(input)
    val pv = pos.eval(input)
    if (iv != null && sv != null && pv != null && b.length <= cap)
      b += ((iv.asInstanceOf[Long], sv.asInstanceOf[Long],
        pv.asInstanceOf[Long]))
    b
  }

  override def merge(a: Buf, b: Buf): Buf = {
    val room = (cap + 1) - a.length
    if (room > 0) a ++= b.take(room)
    a
  }

  override def eval(b: Buf): Any =
    if (b.length > cap) null
    else new GenericArrayData(b.map { case (i, s, p) =>
      new GenericInternalRow(Array[Any](i, s, p)): InternalRow
    }.toArray)

  override def serialize(b: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + b.length * 24)
    bb.putInt(b.length)
    b.foreach { case (i, s, p) =>
      bb.putLong(i); bb.putLong(s); bb.putLong(p) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = createAggregationBuffer()
    var i = 0
    while (i < n) { b += ((bb.getLong, bb.getLong, bb.getLong)); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): CappedCollectPos =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CappedCollectPos =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): CappedCollectPos =
    copy(id = c(0), sz = c(1), pos = c(2))
  override def prettyName: String = "capped_collect_pos"
}

/** Bloom-filter builder over a BIGINT column: the aggregation buffer
  * is the filter's bit array (`numBits` bits as long words), bits are
  * set via Kirsch-Mitzenmacher double hashing (pos_j = h1 + j·h2 for
  * j < numHashes, both halves xxhash64), and partial buffers merge by
  * bitwise OR — so the build is one map-side pass plus an
  * O(numBits/64)-word reduce, independent of row count.
  *
  * The emitted value is SELF-DESCRIBING: word 0 is `numHashes`, the
  * bit words follow. [[BloomContains]] reads k from the data, so a
  * prober can never run with a different hash count than the build
  * used — the mismatch that silently voids the no-false-negative
  * guarantee (probing with MORE hashes than were set can miss real
  * members).
  *
  * This is the decontamination-at-scale primitive: build the filter
  * over the SMALL side (a held-out benchmark's shingle hashes),
  * broadcast the finished bit array (one row), and probe it with
  * [[BloomContains]] in a map-only pass over the 100 TB side — no
  * shuffle of the corpus, unlike the equi-join form (d11). One-sided
  * error: membership may false-positive (rate set by numBits/n and
  * numHashes) but NEVER false-negatives, so no contaminated document
  * escapes. Deterministic (seeded hashes, no RNG).
  */
case class BloomBuildAgg(
    child: Expression, numBits: Int, numHashes: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[Long]] {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  require(numBits > 0 && numBits % 64 == 0, "numBits must be a positive multiple of 64")
  require(numHashes > 0 && numHashes <= 64, "numHashes must be in 1..64")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_agg requires a BIGINT column, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(words: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // MUST stay formula-identical with BloomContains (and its codegen)
      val x = v.asInstanceOf[Long]
      val h1 = BloomHash.h1(x)
      val h2 = BloomHash.h2(x)
      var j = 0
      while (j < numHashes) {
        val pos = ((h1 + j * h2) & Long.MaxValue) % numBits
        words((pos >>> 6).toInt) |= 1L << (pos & 63L)
        j += 1
      }
    }
    words
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(words: Array[Long]): Any = {
    val out = new Array[Long](words.length + 1)
    out(0) = numHashes.toLong // header word: the probe reads k from here
    System.arraycopy(words, 0, out, 1, words.length)
    new GenericArrayData(out)
  }

  override def serialize(words: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(words.length * 8)
    var i = 0
    while (i < words.length) { bb.putLong(words(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val words = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < words.length) { words(i) = bb.getLong; i += 1 }
    words
  }

  override def withNewMutableAggBufferOffset(o: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): BloomBuildAgg = copy(child = c.head)
  override def prettyName: String = "bloom_agg"
}

/** Shared double-hash halves for [[BloomBuildAgg]] / [[BloomContains]]
  * — one place so builder and prober can never drift apart. The
  * codegen in BloomContains calls these statics directly.
  */
object BloomHash {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  def h1(v: Long): Long = XXH64.hashLong(v, 0x9E3779B9L)
  // force odd so h2 is invertible mod 2^64 (all positions reachable)
  def h2(v: Long): Long = XXH64.hashLong(v, 0x85EBCA77L) | 1L
}

/** Bloom-filter membership probe: `bloom_contains(bits, v)` where
  * `bits` is [[BloomBuildAgg]]'s array<long> (usually a broadcast
  * one-row cross join). Both parameters come from the DATA, not the
  * caller: numBits is derived from the array length and numHashes is
  * read from the header word the builder emitted — builder and prober
  * cannot disagree on sizing or hash count. An empty or header-only
  * array (no bit words — e.g. a slice) contains nothing: false, never
  * a division by zero. Codegen'd — the probe sits in the map-side hot
  * path over the full corpus.
  */
case class BloomContains(bits: Expression, value: Expression)
    extends BinaryExpression {
  override def left: Expression = bits
  override def right: Expression = value
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  // element type only: a filter persisted to a table reads back with
  // containsNull=true even though builder output never holds nulls
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (bits.dataType, value.dataType) match {
      case (ArrayType(LongType, _), LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_contains requires (ARRAY<BIGINT>, BIGINT), got " +
            s"(${bits.dataType.catalogString}, ${value.dataType.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val words = a.asInstanceOf[ArrayData]
    if (words.numElements() <= 1) return java.lang.Boolean.FALSE
    val v = b.asInstanceOf[Long]
    val k = words.getLong(0) // header word written by BloomBuildAgg
    // a foreign/corrupted array could carry k <= 0 (every probe would
    // vacuously hit) or a huge k (the loop would effectively hang);
    // the builder only ever writes 1..64
    if (k <= 0 || k > 64) return java.lang.Boolean.FALSE
    val numBits = (words.numElements() - 1).toLong * 64L
    val h1 = BloomHash.h1(v)
    val h2 = BloomHash.h2(v)
    var j = 0L
    while (j < k) {
      val pos = ((h1 + j * h2) & Long.MaxValue) % numBits
      if ((words.getLong((pos >>> 6).toInt + 1) & (1L << (pos & 63L))) == 0L)
        return java.lang.Boolean.FALSE
      j += 1
    }
    java.lang.Boolean.TRUE
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.freshName("bf")
    // same XXH64 seeds as BloomHash.h1/h2 — XXH64 is a Java class, so
    // its statics are directly callable from generated code
    val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |boolean ${p}hit = false;
      |if ($a.numElements() > 1
      |    && $a.getLong(0) > 0L && $a.getLong(0) <= 64L) {
      |  long ${p}k = $a.getLong(0);
      |  long ${p}m = (long) ($a.numElements() - 1) * 64L;
      |  long ${p}h1 = $xxh.hashLong($b, 0x9E3779B9L);
      |  long ${p}h2 = $xxh.hashLong($b, 0x85EBCA77L) | 1L;
      |  ${p}hit = true;
      |  for (long ${p}j = 0; ${p}j < ${p}k; ${p}j++) {
      |    long ${p}pos = ((${p}h1 + ${p}j * ${p}h2) & Long.MAX_VALUE) % ${p}m;
      |    if (($a.getLong((int) (${p}pos >>> 6) + 1) & (1L << (${p}pos & 63L))) == 0L) {
      |      ${p}hit = false; break;
      |    }
      |  }
      |}
      |${ev.value} = ${p}hit;
      |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(bits = newLeft, value = newRight)
}

/** Exact dot product of two quantized (array<long>) vectors in one
  * fused loop — replaces `aggregate(zip_with(a, b, *), 0L, +)` in the
  * ANN hot path, which allocates the zipped array per pair. Long
  * arithmetic is exact, so results are bit-identical to the HOF form.
  */
case class LongDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "long_dot"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"long_dot requires two ARRAY<BIGINT> columns, got " +
            s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // mismatched dims: null, not a truncated dot (see CosineSim)
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0L
    var i = 0
    while (i < n) { dot += x.getLong(i) * y.getLong(i); i += 1 }
    java.lang.Long.valueOf(dot)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.freshName("ld")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |if ($a.numElements() != $b.numElements()) {
      |  ${ev.isNull} = true;
      |} else {
      |  long ${p}dot = 0L;
      |  for (int ${p}i = 0; ${p}i < $a.numElements(); ${p}i++) {
      |    ${p}dot += $a.getLong(${p}i) * $b.getLong(${p}i);
      |  }
      |  ${ev.value} = ${p}dot;
      |}
      |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDot =
    copy(left = newLeft, right = newRight)
}

/** Count-Min sketch builder over a BIGINT column: the buffer is a
  * depth×width counter matrix; row i's position for value x is
  * Kirsch-Mitzenmacher (h1 + i·h2) mod width (same [[BloomHash]]
  * halves as the Bloom pair), and partial buffers merge by element-
  * wise ADD — one map-side pass plus an O(depth·width)-word reduce,
  * independent of row count. Like [[BloomBuildAgg]], the emitted
  * value is SELF-DESCRIBING: words 0/1 carry depth/width so the
  * estimator reads its parameters from the data.
  *
  * This is the heavy-hitters-at-scale primitive: estimate any value's
  * frequency with bounded memory and NO key-partitioned shuffle of
  * the corpus (the exact d10 groupBy moves every distinct token
  * through an exchange; a 100 TB vocab of billions of types makes
  * that the dominant cost). One-sided error: estimates never
  * UNDER-count (collisions only add), overshoot bounded by
  * ~2N/width per row, min across depth rows.
  */
case class CmsBuildAgg(
    child: Expression, depth: Int, width: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[Long]] {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  require(depth > 0 && depth <= 64, "depth must be in 1..64")
  require(width > 0 && depth.toLong * width <= Int.MaxValue - 2,
    "depth * width must fit an array")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cms_agg requires a BIGINT column, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(counts: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // MUST stay formula-identical with CmsEstimate (and its codegen)
      val x = v.asInstanceOf[Long]
      val h1 = BloomHash.h1(x)
      val h2 = BloomHash.h2(x)
      var i = 0
      while (i < depth) {
        val pos = (((h1 + i * h2) & Long.MaxValue) % width).toInt
        counts(i * width + pos) += 1
        i += 1
      }
    }
    counts
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(counts: Array[Long]): Any = {
    val out = new Array[Long](counts.length + 2)
    out(0) = depth.toLong // header words: the estimator reads both
    out(1) = width.toLong
    System.arraycopy(counts, 0, out, 2, counts.length)
    new GenericArrayData(out)
  }

  override def serialize(counts: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(counts.length * 8)
    var i = 0
    while (i < counts.length) { bb.putLong(counts(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val counts = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < counts.length) { counts(i) = bb.getLong; i += 1 }
    counts
  }

  override def withNewMutableAggBufferOffset(o: Int): CmsBuildAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsBuildAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): CmsBuildAgg = copy(child = c.head)
  override def prettyName: String = "cms_agg"
}

/** Count-Min frequency estimate: `cms_estimate(counts, v)` over
  * [[CmsBuildAgg]]'s array (usually a broadcast one-row cross join).
  * depth/width come from the header words, so builder and estimator
  * cannot disagree; a degenerate array estimates 0. Codegen'd — the
  * probe sits in the map-side hot path.
  */
case class CmsEstimate(counts: Expression, value: Expression)
    extends BinaryExpression {
  override def left: Expression = counts
  override def right: Expression = value
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  // element type only — see BloomContains
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (counts.dataType, value.dataType) match {
      case (ArrayType(LongType, _), LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cms_estimate requires (ARRAY<BIGINT>, BIGINT), got " +
            s"(${counts.dataType.catalogString}, ${value.dataType.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val words = a.asInstanceOf[ArrayData]
    if (words.numElements() <= 2) return java.lang.Long.valueOf(0L)
    val v = b.asInstanceOf[Long]
    val depth = words.getLong(0)
    val width = words.getLong(1)
    // header must agree with the actual array length — a truncated or
    // foreign array would otherwise read out of bounds (silent garbage
    // under codegen's unchecked getLong). depth <= 64 also bounds the
    // product so a crafted huge width cannot overflow the check itself
    if (depth <= 0 || depth > 64 || width <= 0 || width > Int.MaxValue - 2 ||
        words.numElements().toLong != depth * width + 2)
      return java.lang.Long.valueOf(0L)
    val h1 = BloomHash.h1(v)
    val h2 = BloomHash.h2(v)
    var est = Long.MaxValue
    var i = 0L
    while (i < depth) {
      val pos = ((h1 + i * h2) & Long.MaxValue) % width
      val c = words.getLong((i * width + pos).toInt + 2)
      if (c < est) est = c
      i += 1
    }
    java.lang.Long.valueOf(est)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.freshName("cms")
    val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |long ${p}est = 0L;
      |if ($a.numElements() > 2
      |    && $a.getLong(0) > 0 && $a.getLong(0) <= 64L
      |    && $a.getLong(1) > 0 && $a.getLong(1) <= (long) (Integer.MAX_VALUE - 2)
      |    && (long) $a.numElements() == $a.getLong(0) * $a.getLong(1) + 2L) {
      |  long ${p}d = $a.getLong(0);
      |  long ${p}w = $a.getLong(1);
      |  long ${p}h1 = $xxh.hashLong($b, 0x9E3779B9L);
      |  long ${p}h2 = $xxh.hashLong($b, 0x85EBCA77L) | 1L;
      |  ${p}est = Long.MAX_VALUE;
      |  for (long ${p}i = 0; ${p}i < ${p}d; ${p}i++) {
      |    long ${p}pos = ((${p}h1 + ${p}i * ${p}h2) & Long.MAX_VALUE) % ${p}w;
      |    long ${p}c = $a.getLong((int) (${p}i * ${p}w + ${p}pos) + 2);
      |    if (${p}c < ${p}est) ${p}est = ${p}c;
      |  }
      |}
      |${ev.value} = ${p}est;
      |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(counts = newLeft, value = newRight)
}
