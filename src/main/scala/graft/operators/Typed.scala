package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Aggregator
import graft.Tables
import graft.functions.GraftFunctions

/** Typed Dataset surface: case-class rows + `Aggregator` where
  * compile-time field checks matter (SURVEY.md §4 "Dataset[T] where
  * type safety helps"), and the KMV custom aggregate.
  */
object Typed {

  case class LineRow(l_returnflag: String, l_quantity: Double)

  /** Exact integral-quantity sum as a typed Aggregator (quantities are
    * whole numbers, so the long sum is exact and order-independent).
    */
  object QtySum extends Aggregator[LineRow, Long, Long] {
    override def zero: Long = 0L
    override def reduce(b: Long, r: LineRow): Long = b + r.l_quantity.toLong
    override def merge(a: Long, b: Long): Long = a + b
    override def finish(b: Long): Long = b
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  // q40: typed groupByKey + Aggregator — the Dataset API path through
  // the same Catalyst machinery (plans identically to the DataFrame
  // groupBy; the Aggregator is a DeclarativeAggregate-backed typed
  // column).
  def q40TypedAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_quantity"))
      .as[LineRow]
      .groupByKey(_.l_returnflag)
      .agg(QtySum.toColumn.name("sum_qty"))
      .toDF("l_returnflag", "sum_qty")
      .orderBy("l_returnflag")
  }

  // q39: KMV bottom-k distinct sketch (custom TypedImperativeAggregate)
  // next to the exact count — rows-only (the sketch is ours alone);
  // TypedSpec asserts the estimation error instead.
  def q39KmvDistinct(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(GraftFunctions.kmv_distinct(col("l_partkey"), 256).as("kmv_parts"),
           countDistinct(col("l_partkey")).as("exact_parts"))
      .orderBy("l_returnflag")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q39_kmv_distinct" -> (q39KmvDistinct _),
    "q40_typed_agg" -> (q40TypedAgg _),
  )

  /** q39 rows-only: the KMV hash family is engine-specific. */
  val oracles: Map[String, String] = Map(
    "q40_typed_agg" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
  )
}
