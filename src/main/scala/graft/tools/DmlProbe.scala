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
      .config("spark.sql.extensions", "graft.GraftExtensions")
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
    // ---- the dv trade: copy-on-write vs merge-on-read DELETE --------
    // Two FRESH identical tables, the same scattered predicate
    // (a fraction of the rows in half the files — the MoR sweet spot:
    // CoW must rewrite every touched file, MoR stages one sidecar).
    // Then the price paid back at read time: the dv anti-join scan vs
    // the plain scan, and purge() to materialize.
    def freshTable() = graft.sources.GraftTable.create(spark,
      java.nio.file.Files.createTempDirectory("graft_dml_probe")
        .toString + "/t",
      orders.repartitionByRange(nFiles, col("o_orderkey")))
    val scattered = col("o_orderkey") > keyMax / 2 &&
      col("o_orderstatus") === "O"
    val tCow = freshTable()
    val (vC, cowDelS) = timed(tCow.deleteWhere(scattered))
    val cowRewrote = tCow.readCommit(vC).removes.size
    // the 100 TB metric: bytes the commit WROTE back (rewritten
    // survivor files for CoW; the positional sidecar for MoR) — local
    // NVMe hides volume, object storage and TB files do not
    val cowBytes = tCow.readCommit(vC).adds.map(_.bytes).sum
    val tMor = freshTable()
    val (vR, morDelS) = timed(tMor.deleteWhere(scattered, mor = true))
    val morDvFiles = tMor.readCommit(vR).dvs.size
    val morDvBytes = tMor.readCommit(vR).dvs.map(_._2.bytes).distinct.sum
    // the minimal paths (cdfImages=false — Delta's default posture):
    // CoW = probe + survivor rewrite; MoR = ONE positions pass
    val tCow0 = freshTable()
    val (_, cowDel0S) = timed(tCow0.deleteWhere(scattered,
      cdfImages = false))
    val tMor0 = freshTable()
    val (_, morDel0S) = timed(tMor0.deleteWhere(scattered,
      cdfImages = false, mor = true))
    def rowsOf(t0: graft.sources.GraftTable): Long =
      t0.read().agg(count(lit(1))).head.getLong(0)
    val (nCow, cowReadS) = minTimed(rowsOf(tCow))
    val (nMor, morReadS) = minTimed(rowsOf(tMor))
    require(nCow == nMor, s"cow/mor diverged: $nCow vs $nMor")
    val (_, purgeS) = timed(tMor.purge())
    val nRows = orders.count()
    println(s"""{"probe":"dml","sf":"$sfDir","n_rows":$nRows,""" +
      s""""n_files":$total,"build_s":$buildS,""" +
      s""""merge_s":$mergeS,"merge_touched_files":$mergeTouched,""" +
      s""""delete_s":$delS,"delete_touched_files":$delTouched,""" +
      s""""feed_s":$feedS,"skip_read_s":$skipS,"full_read_s":$fullS,""" +
      s""""skip_read_rows":$nSkip,""" +
      s""""cow_delete_s":$cowDelS,"cow_rewrote_files":$cowRewrote,""" +
      s""""cow_rewrote_bytes":$cowBytes,""" +
      s""""mor_delete_s":$morDelS,"mor_dv_files":$morDvFiles,""" +
      s""""mor_dv_bytes":$morDvBytes,""" +
      s""""cow_delete_nocdf_s":$cowDel0S,"mor_delete_nocdf_s":$morDel0S,""" +
      s""""cow_read_s":$cowReadS,"mor_read_s":$morReadS,""" +
      s""""purge_s":$purgeS}""")
    spark.stop()
  }
}
