package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Regression for the round-1 codegen defect: RollingHash's generated
  * locals were not freshName'd, so TWO rolling_hash calls compiled
  * into one whole-stage-codegen scope redeclared the same Java locals
  * — Janino failure, silent interpreted fallback (hard failure under
  * CODEGEN_ONLY). This pins both calls in one projection while
  * forbidding fallback.
  */
class CodegenSpec extends SparkSpec {

  test("two rolling_hash calls share a codegen scope under CODEGEN_ONLY") {
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try {
      val r = Tables.documents(spark, sf).limit(10)
        .select(
          GraftFunctions.rolling_hash(col("text")).as("h1"),
          GraftFunctions.rolling_hash(upper(col("text"))).as("h2"))
        .collect()
      assert(r.length == 10)
      assert(r.forall(row => !row.isNullAt(0) && !row.isNullAt(1)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
