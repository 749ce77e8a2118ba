package graft

import org.apache.spark.sql.functions._
import graft.sources.Readers

/** JDBC passthrough against Derby embedded (the JDBC database Spark
  * ships). Derby folds unquoted identifiers to uppercase, hence the
  * O_* column names on readback.
  */
class JdbcSpec extends SparkSpec {

  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"
  private lazy val url = {
    val dir = java.nio.file.Files.createTempDirectory("graft_derby")
    s"jdbc:derby:$dir/db;create=true"
  }

  test("jdbc write/read round-trips through Derby") {
    val src = Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    Readers.writeJdbc(src, url, "orders_rt", driver)
    val back = Readers.jdbc(spark, url, "orders_rt", driver)
    assert(back.count() == src.count())
    assert(back.agg(sum(col("O_ORDERKEY"))).head.getLong(0) ==
           src.agg(sum(col("o_orderkey"))).head.getLong(0))
  }

  test("jdbc filters push into the remote SQL") {
    val back = Readers.jdbc(spark, url, "orders_rt", driver)
      .filter(col("O_ORDERKEY") < 100)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThan"),
      s"filter not pushed to JDBC source:\n$plan")
  }

  test("partitioned jdbc read fans out over range-bounded connections") {
    val src = Tables.orders(spark, sf)
    val bounds = src.agg(min("o_orderkey"), max("o_orderkey")).head
    val back = Readers.jdbcPartitioned(spark, url, "orders_rt", driver,
      "O_ORDERKEY", bounds.getLong(0), bounds.getLong(1), numPartitions = 4)
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == src.count())
  }
}
