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

  /** Register for SQL use: `SELECT rolling_hash(text) …`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.graft.shim.registerFunction(
      spark, "rolling_hash", es => RollingHash(es.head))
    org.apache.spark.sql.graft.shim.registerFunction(
      spark, "cosine_sim", es => CosineSim(es.head, es(1)))
  }
}
