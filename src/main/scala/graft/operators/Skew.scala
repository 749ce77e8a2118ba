package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Skew handling (SURVEY.md §5). AQE's skew-join split covers joins;
  * for aggregations onto a handful of giant keys the classic fix is
  * salting: pre-aggregate on (key, salt) so every reducer sees
  * bounded input, then fold the salt out. Results are identical to
  * the direct aggregation — q30 proves it against the plain-SQL
  * oracle.
  */
object Skew {

  /** Two-phase salted sum/count over a skewed grouping key. */
  def saltedAgg(df: DataFrame, key: Column, value: Column,
                salts: Int = 16): DataFrame = {
    val partial = df
      .groupBy(key.as("k"), pmod(xxhash64(value), lit(salts)).as("salt"))
      .agg(sum(value).as("psum"), count(lit(1)).as("pcnt"))
    partial.groupBy(col("k"))
      .agg(sum(col("psum")).as("total"), sum(col("pcnt")).as("n"))
  }

  // q30: salted aggregation over the 3-value l_returnflag key — at
  // 100 TB a direct groupBy lands ~33 TB on one reducer; salted, each
  // of the 16 sub-keys is bounded, and the fold-out is 48 tiny rows.
  def q30SaltedAgg(s: SparkSession, d: String): DataFrame =
    saltedAgg(Tables.lineitem(s, d), col("l_returnflag"),
              col("l_quantity").cast("decimal(18,2)"))
      .select(col("k").as("l_returnflag"),
              col("total").cast("double").as("sum_qty"), col("n"))
      .orderBy("l_returnflag")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_salted_agg" -> (q30SaltedAgg _),
  )

  val oracles: Map[String, String] = Map(
    "q30_salted_agg" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
  )
}
