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

  /** Salted join: replicate the small side `salts` ways and scatter
    * the big side's hot keys across (key, salt) — each reducer gets a
    * 1/salts slice of the hot key instead of all of it. The salt is
    * derived from a per-row unique id (deterministic, no RNG) and
    * folds out of the result: salting is invisible to the answer,
    * which is what the oracle proves.
    */
  def saltedJoin(big: DataFrame, dim: DataFrame, key: String,
                 saltSrc: Column, salts: Int = 8): DataFrame = {
    val b = big.withColumn("__salt", pmod(xxhash64(saltSrc), lit(salts)))
    val dimR = dim.withColumn("__salt",
      explode(expr(s"sequence(0, ${salts - 1})")))
    b.join(dimR, Seq(key, "__salt")).drop("__salt")
  }

  // q31: salted join over a manufactured hot key (every 10th user
  // collapses onto key 0 → ~10% of the table in one join bucket). The
  // dim carries a small weight attribute; the post-join aggregate is
  // compared against the plain-join oracle, proving the salt is
  // semantics-free. (AQE's skew split handles this adaptively at
  // runtime; explicit salting is the plan-level guarantee for the
  // pathological keys AQE statistics can miss.)
  def q31SaltedJoin(s: SparkSession, d: String): DataFrame = {
    val big = Tables.events(s, d)
      .select(expr("IF(user_id % 10 = 0, 0L, user_id)").as("k"),
              col("event_id"), col("value"))
    val dim = big.select("k").distinct()
      .withColumn("w", (col("k") % 7 + 1).cast("long"))
    saltedJoin(big, dim, "k", col("event_id"))
      .groupBy("k")
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast("decimal(18,2)") * col("w"))
             .cast("double").as("weighted"))
      .orderBy("k")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_salted_agg" -> (q30SaltedAgg _),
    "q31_salted_join" -> (q31SaltedJoin _),
  )

  val oracles: Map[String, String] = Map(
    "q30_salted_agg" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q31_salted_join" ->
      """WITH big AS (
        |  SELECT CASE WHEN user_id % 10 = 0 THEN 0 ELSE user_id END AS k,
        |    event_id, value
        |  FROM events),
        |dim AS (SELECT DISTINCT k, CAST(k % 7 + 1 AS BIGINT) AS w FROM big)
        |SELECT big.k, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2)) * w) AS DOUBLE) AS weighted
        |FROM big JOIN dim ON big.k = dim.k
        |GROUP BY big.k ORDER BY big.k""".stripMargin,
  )
}
