package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-16 scale probe (SCALE_r16.md, verdict item 7): the q98
  * Z-ORDER LAYOUT's READ-side value, measured. The q98 oracle serves
  * a whole-table aggregate (content neutrality — correct for the
  * driver gate), but the layout exists for the PRUNED two-dim range
  * probe. Build the q98 shape twice over the same rows —
  *
  *   A. arrival-ordered: fragmented partitioned land, no re-cluster
  *      (every file spans ~the full (o_orderkey, o_custkey) plane);
  *   Z. scoped z-order: `GRAFT OPTIMIZE … WHERE (ostatus = 'F')
  *      ZORDER BY (o_orderkey, o_custkey) FILES 16` (each file owns
  *      a compact Morton rectangle);
  *
  * then push centered two-dim range slices of tightening span (1/2,
  * 1/4, 1/8, 1/16 of each dimension) through the stats-skipping
  * reader ([[graft.sources.GraftTable.prunedFiles]] — the log-level
  * min/max prune, no footer opened) and COUNT FILES TOUCHED in the
  * hot partition. The claim: the z-ordered fraction falls with the
  * span while the arrival-ordered twin stays ~1.0.
  *
  * `sbt "runMain graft.tools.Probe16 [sfDir]"`.
  */
object Probe16 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.GraftTable

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"), col("o_orderstatus").as("ostatus"))
    def land(tag: String): (String, GraftTable) = {
      val root = java.nio.file.Files
        .createTempDirectory(s"probe16_$tag").toString + "/t"
      val t = GraftTable.forPath(spark, root)
      t.appendPartitioned(orders.repartition(16), "ostatus")
      (root, t)
    }
    val (_, tA) = land("arrival")
    val (rootZ, tZ) = land("zorder")
    val z0 = System.nanoTime()
    spark.sql(s"GRAFT OPTIMIZE '$rootZ' WHERE (ostatus = 'F') " +
      "ZORDER BY (o_orderkey, o_custkey) FILES 16")
    val zBuild = (System.nanoTime() - z0) / 1e9

    val r = orders.agg(min("o_orderkey"), max("o_orderkey"),
      min("o_custkey"), max("o_custkey")).head
    val (kLo, kHi, cLo, cHi) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    def hot(paths: Seq[String]) = paths.count(_.contains("/ostatus=F/"))
    val totA = hot(tA.liveFiles().map(f => "/" + f._1))
    val totZ = hot(tZ.liveFiles().map(f => "/" + f._1))
    println(s"[probe16] sf=$sfDir hot-partition files: " +
      s"arrival=$totA zorder=$totZ (zorder build ${f2(zBuild)} s)")
    println("[probe16] span | arrival files (frac) | zorder files (frac)")
    Seq(2L, 4L, 8L, 16L).foreach { denom =>
      val kSpan = (kHi - kLo) / denom
      val cSpan = (cHi - cLo) / denom
      val kMid = kLo + (kHi - kLo) / 2
      val cMid = cLo + (cHi - cLo) / 2
      val pred = col("o_orderkey").between(kMid - kSpan / 2,
          kMid + kSpan / 2) &&
        col("o_custkey").between(cMid - cSpan / 2, cMid + cSpan / 2)
      val fa = hot(tA.prunedFiles(pred))
      val fz = hot(tZ.prunedFiles(pred))
      println(f"[probe16] 1/$denom%-3d | $fa%3d / $totA (${fa.toDouble / totA}%.2f) " +
        f"| $fz%3d / $totZ (${fz.toDouble / totZ}%.2f)")
    }
    spark.stop()
  }

  private def f2(v: Double) =
    String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
}
