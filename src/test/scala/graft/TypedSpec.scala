package graft

import org.apache.spark.sql.functions._
import graft.operators.Typed
import graft.functions.GraftFunctions

class TypedSpec extends SparkSpec {

  test("typed Aggregator sum equals the SQL sum") {
    val typed = Typed.q40TypedAgg(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sql = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast("long")).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(typed == sql)
  }

  test("KMV sketch estimates within 10% on known cardinalities") {
    for ((df, c, exact) <- Seq(
        (Tables.lineitem(spark, sf), "l_orderkey", 0L),
        (Tables.orders(spark, sf), "o_custkey", 0L))) {
      val r = df.agg(GraftFunctions.kmv_distinct(col(c), 256).as("kmv"),
                     countDistinct(col(c)).as("exact")).head
      val (kmv, ex) = (r.getLong(0), r.getLong(1))
      assert(math.abs(kmv - ex).toDouble / ex < 0.10,
        s"$c: kmv=$kmv exact=$ex")
    }
  }

  test("KMV is exact below k") {
    // 25 distinct nation keys < k=256 -> sketch must be exact
    val r = Tables.nation(spark, sf)
      .agg(GraftFunctions.kmv_distinct(col("n_nationkey").cast("long"), 256)
        .as("kmv")).head
    assert(r.getLong(0) == 25L)
  }

  test("streaming custom state matches the batch aggregate") {
    val stream = graft.streaming.EventStream.s4StreamCustomState(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val batch = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), max("value").as("m"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(stream == batch)
  }
}
