package graft

import org.apache.spark.sql.functions._
import graft.sources.GraftTable
import java.nio.file.Files

class GraftDataSourceSpec extends SparkSpec {

  private def multiset(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap

  test("format(\"graft\") reads the latest snapshot and time-travels by option") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val a = li.filter(col("l_orderkey") % 2 === 0)
    val b = li.filter(col("l_orderkey") % 2 === 1)
    val root = Files.createTempDirectory("graft_dsv2").toString + "/t"
    val t = GraftTable.create(spark, root, a)    // v1
    t.append(b)                                  // v2
    t.compact(1L << 30)                          // v3
    val latest = spark.read.format("graft").load(root)
    assert(multiset(latest) == multiset(li),
      "format(graft) latest snapshot diverged from GraftTable.read")
    val v1 = spark.read.format("graft")
      .option("versionAsOf", "1").load(root)
    assert(multiset(v1) == multiset(a), "versionAsOf time travel diverged")
    // SQL surface with no imports: USING graft
    spark.sql("DROP TABLE IF EXISTS graft_ds_t")
    spark.sql(s"CREATE TABLE graft_ds_t USING graft OPTIONS (path '$root')")
    try {
      assert(multiset(spark.table("graft_ds_t")) == multiset(li))
    } finally spark.sql("DROP TABLE graft_ds_t")
  }

  test("the graft scan keeps parquet pushdown and column pruning") {
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey", "l_quantity", "l_shipdate")
    val root = Files.createTempDirectory("graft_dsv2_push").toString + "/t"
    GraftTable.create(spark, root, li.repartition(4))
    val q = spark.read.format("graft").load(root)
      .filter(col("l_orderkey") === 42L)
      .select("l_orderkey", "l_quantity")
    val plan = q.queryExecution.executedPlan.toString
    // the whole point of delegating to Spark's v2 parquet table: the
    // filter reaches the scan and the scan reads only two columns
    assert(plan.contains("PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,42)")
        || plan.contains("PushedFilters: [EqualTo(l_orderkey,42)"),
      s"filter not pushed to the graft scan:\n$plan")
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity"),
      s"column pruning lost through the graft scan:\n$plan")
    // and the rows are right
    val want = li.filter(col("l_orderkey") === 42L)
      .select("l_orderkey", "l_quantity")
    assert(multiset(q) == multiset(want))
  }

  test("df.write.format(\"graft\") maps save modes onto atomic commits") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val a = li.filter(col("l_orderkey") % 2 === 0)
    val b = li.filter(col("l_orderkey") % 2 === 1)
    val root = Files.createTempDirectory("graft_dsv2_w").toString + "/t"
    a.write.format("graft").save(root)                       // v1 (create)
    b.write.format("graft").mode("append").save(root)        // v2
    val t = GraftTable.forPath(spark, root)
    assert(t.latestVersion == 2)
    assert(multiset(spark.read.format("graft").load(root)) == multiset(li))
    // overwrite replaces the live set in one commit; history survives
    a.write.format("graft").mode("overwrite").save(root)     // v3
    assert(multiset(t.read()) == multiset(a))
    assert(multiset(t.readVersion(2)) == multiset(li),
      "overwrite must not destroy time travel")
    intercept[IllegalStateException] {
      b.write.format("graft").mode("errorifexists").save(root)
    }
    b.write.format("graft").mode("ignore").save(root)        // no-op
    assert(t.latestVersion == 3)
    // a mismatched-schema append is rejected BEFORE it can poison
    // later reads (mixed file lists silently take one file's schema)
    intercept[IllegalArgumentException] {
      li.withColumnRenamed("l_quantity", "qty")
        .write.format("graft").mode("append").save(root)
    }
    assert(t.latestVersion == 3, "rejected append must not commit")
  }

  test("GraftCatalog serves SQL VERSION AS OF through the same snapshots") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val a = li.filter(col("l_orderkey") % 2 === 0)
    val root = Files.createTempDirectory("graft_cat").toString + "/t"
    val t = GraftTable.create(spark, root, a)      // v1
    t.append(li.filter(col("l_orderkey") % 2 === 1)) // v2
    t.overwrite(a.limit(10))                        // v3
    spark.conf.set("spark.sql.catalog.gt",
      classOf[graft.sources.GraftCatalog].getName)
    try {
      assert(multiset(spark.sql(s"SELECT * FROM gt.`$root`")) ==
        multiset(a.limit(10)), "catalog latest read diverged")
      assert(multiset(spark.sql(
          s"SELECT * FROM gt.`$root` VERSION AS OF 2")) == multiset(li),
        "SQL VERSION AS OF diverged from the commit log")
      // the time-traveled scan is still the pushed-down parquet scan
      val plan = spark.sql(
        s"SELECT l_quantity FROM gt.`$root` VERSION AS OF 2 " +
          "WHERE l_orderkey = 42").queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [") && plan.contains("l_orderkey"),
        s"catalog read lost pushdown:\n$plan")
    } finally spark.conf.unset("spark.sql.catalog.gt")
  }

  test("TIMESTAMP AS OF resolves to the newest commit at or before the instant") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val a = li.filter(col("l_orderkey") % 2 === 0)
    val b = li.filter(col("l_orderkey") % 2 === 1)
    val root = Files.createTempDirectory("graft_tsof").toString + "/t"
    val t = GraftTable.create(spark, root, a)   // v1
    Thread.sleep(30)
    val between = System.currentTimeMillis()
    Thread.sleep(30)
    t.append(b)                                 // v2
    assert(t.versionAt(between).contains(1L))
    assert(multiset(t.readTimestampAsOf(between)) == multiset(a))
    assert(multiset(spark.read.format("graft")
        .option("timestampAsOf", between.toString).load(root)) == multiset(a),
      "format timestampAsOf diverged")
    // SQL TIMESTAMP AS OF through the catalog (micros-literal route)
    spark.conf.set("spark.sql.catalog.gtts",
      classOf[graft.sources.GraftCatalog].getName)
    try {
      val lit = new java.sql.Timestamp(between).toString
      assert(multiset(spark.sql(
          s"SELECT * FROM gtts.`$root` TIMESTAMP AS OF '$lit'")) == multiset(a),
        "SQL TIMESTAMP AS OF diverged")
      intercept[Exception] {
        spark.sql(s"SELECT * FROM gtts.`$root` " +
          "TIMESTAMP AS OF '1999-01-01 00:00:00'").collect()
      }
    } finally spark.conf.unset("spark.sql.catalog.gtts")
  }

  test("a resolved graft relation is snapshot-isolated from later commits") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val a = li.filter(col("l_orderkey") % 2 === 0)
    val root = Files.createTempDirectory("graft_dsv2_iso").toString + "/t"
    val t = GraftTable.create(spark, root, a.repartition(4))
    val pinned = spark.read.format("graft").load(root)
    val want = multiset(a)
    t.append(li.filter(col("l_orderkey") % 2 === 1))
    t.compact(1L << 30)
    assert(multiset(pinned) == want,
      "a resolved graft relation was perturbed by later commits")
  }
}
