package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the copy-on-write DML verbs (SCALE_r10): builds a
  * FRESH range-staged GraftTable from `orders` at the given SF dir
  * (the bench entry q78 amortizes its lifecycle per session, so it
  * measures the serving read; this measures the DML itself), then
  * times merge / deleteWhere / changeFeed end-to-end and reports the
  * copy-on-write evidence — how many of the table's files each verb
  * actually rewrote. One JSON line, ScaleData-compatible inputs.
  *
  *   sbt "runMain graft.tools.DmlProbe /root/testdata/sf0.01 16"
  */
object DmlProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: DmlProbe <sfDir> [nFiles]")
    val sfDir = args(0)
    val nFiles = if (args.length >= 2) args(1).toInt else 16
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val orders = graft.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val keyMax = orders.agg(max("o_orderkey")).head.getLong(0)
    val root = java.nio.file.Files
      .createTempDirectory("graft_dml_probe").toString + "/t"
    val (t, buildS) = timed(graft.sources.GraftTable.create(spark, root,
      orders.repartitionByRange(nFiles, col("o_orderkey"))))
    val total = t.liveFiles().size
    // merge batch confined to the low key decade + a few inserts —
    // the endpoint-shaped write the reference's SaveData sends
    val updates = orders
      .filter(col("o_orderkey") <= keyMax / 10 &&
        pmod(col("o_orderkey"), lit(3)) === 0)
      .select(col("o_orderkey"), (col("o_totalprice") * 2).as("o_totalprice"))
    val (vM, mergeS) = timed(t.merge(updates, "o_orderkey"))
    val mergeTouched = t.readCommit(vM).removes.size
    val (vD, delS) = timed(t.deleteWhere(
      col("o_orderkey") > keyMax / 2 && col("o_orderstatus") === "O"))
    val delTouched = t.readCommit(vD).removes.size
    val ((), feedS) = timed {
      t.changeFeed(1).get.groupBy("_change_type").count().collect(); ()
    }
    // the DSv2 data-skipping read: a selective key predicate through
    // format("graft") plans only the stats-surviving files; compare
    // against the same filter forced over the FULL file list (the
    // readVersion path) — both return identical rows
    def agg(df: org.apache.spark.sql.DataFrame): Long = df
      .filter(col("o_orderkey") <= keyMax / 100)
      .agg(count(lit(1))).head.getLong(0)
    // min-of-2 each, interleaved, so page-cache warmth doesn't bill
    // whichever path happens to run first
    def minTimed(f: => Long): (Long, Double) = {
      val (a, t1) = timed(f); val (_, t2) = timed(f)
      (a, math.min(t1, t2))
    }
    val (nSkip, skipS) = minTimed(agg(
      spark.read.format("graft").load(t.root)))
    // same DSv2 path with skipping opted out — isolates the skipping
    // effect from the v1-vs-DSv2 resolution constant
    val (nFull, fullS) = minTimed(agg(spark.read.format("graft")
      .option("dataSkipping", "false").load(t.root)))
    require(nSkip == nFull, s"skip read diverged: $nSkip vs $nFull")
    val nRows = orders.count()
    println(s"""{"probe":"dml","sf":"$sfDir","n_rows":$nRows,""" +
      s""""n_files":$total,"build_s":$buildS,""" +
      s""""merge_s":$mergeS,"merge_touched_files":$mergeTouched,""" +
      s""""delete_s":$delS,"delete_touched_files":$delTouched,""" +
      s""""feed_s":$feedS,"skip_read_s":$skipS,"full_read_s":$fullS,""" +
      s""""skip_read_rows":$nSkip}""")
    spark.stop()
  }
}
