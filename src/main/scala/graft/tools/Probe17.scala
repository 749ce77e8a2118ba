package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-17 scale probe (SCALE_r17.md, verdict item 1's acceptance):
  * the size-aware MERGE source strategy, measured across three
  * decades (sf0.1 / x10 / x100).
  *
  *   A. CORPUS-SIZED merge — every 5th order re-priced (a ~20%
  *      backfill batch: 30 K rows at 1×, 3 M at 100×). Under the old
  *      unconditional broadcast this shape OOMs the driver at scale;
  *      under the gate it must SELF-SELECT the shuffle regime (the
  *      commit info line is the witness), complete without OOM, and
  *      scale ~linearly (the CoW rewrite touches every file — the
  *      honest cost of a 20% backfill).
  *   B. ENDPOINT-SIZED merge on the same table — a ~500-key batch
  *      must still pick the broadcast regime at every decade (the
  *      fast path the reference's upload shape keeps).
  *   C. p10_web_corpus — the composed strip→normalize→dedup→gate
  *      pipeline must stay corpus-linear (one shuffle end-to-end).
  *
  * `sbt "runMain graft.tools.Probe17 [dirs...]"`.
  */
object Probe17 {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/scale_x10", "/tmp/scale_x100")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.GraftTable
    import graft.sources.MergeClauses._

    def secs(t0: Long) = (System.nanoTime() - t0) / 1e9
    println("dir\tphase\tseconds\trows\tstrategy")
    dirs.foreach { d =>
      val orders = spark.read.parquet(s"$d/orders.parquet")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"))
      val root = java.nio.file.Files
        .createTempDirectory("probe17").toString + "/t"
      val t = GraftTable.forPath(spark, root)
      val l0 = System.nanoTime()
      t.append(orders.repartitionByRange(32, col("o_orderkey")))
      println(f"$d\tland\t${secs(l0)}%.2f\t${t.countRows().getOrElse(-1L)}\t-")

      // A. corpus-sized source: every 5th key re-priced (x2), plus a
      // slab of brand-new keys — update AND insert at backfill volume
      val batch = orders.filter(pmod(col("o_orderkey"), lit(5L)) === 0)
        .select(col("o_orderkey"), (col("o_totalprice") * 2).as("p"))
      val m0 = System.nanoTime()
      val v = t.mergeInto(batch, Seq("o_orderkey"),
        matched = Seq(MatchedUpdate(None,
          Map("o_totalprice" -> expr("s.p")))),
        notMatched = Seq(NotMatchedInsert(None,
          Map("o_orderkey" -> expr("s.o_orderkey"),
            "o_totalprice" -> expr("s.p")))))
      val bulkS = secs(m0)
      val bulkInfo = t.commitInfo(v).getOrElse("-")
      println(f"$d\tbulk_merge\t$bulkS%.2f\t${batch.count()}\t$bulkInfo")

      // serve after the bulk merge
      val s0 = System.nanoTime()
      val agg = t.read().agg(count(lit(1)),
        sum(col("o_totalprice").cast("decimal(18,2)"))).head
      println(f"$d\tserve\t${secs(s0)}%.2f\t${agg.getLong(0)}\t-")

      // B. endpoint-sized batch on the SAME (now larger) table: the
      // broadcast fast path must survive the gate
      val keyMin = orders.agg(min("o_orderkey")).head.getLong(0)
      val small = orders
        .filter(col("o_orderkey").between(keyMin, keyMin + 2000))
        .select(col("o_orderkey"), (col("o_totalprice") * 3).as("p"))
      val e0 = System.nanoTime()
      val v2 = t.mergeInto(small, Seq("o_orderkey"),
        matched = Seq(MatchedUpdate(None,
          Map("o_totalprice" -> expr("s.p")))))
      val epS = secs(e0)
      val epInfo = t.commitInfo(v2).getOrElse("-")
      println(f"$d\tendpoint_merge\t$epS%.2f\t${small.count()}\t$epInfo")

      // C. the composed cleaning pipeline, corpus-linear check
      val p0 = System.nanoTime()
      graft.operators.Pipeline.p10WebCorpus(spark, d)
        .write.format("noop").mode("overwrite").save()
      println(f"$d\tp10_web_corpus\t${secs(p0)}%.2f\t-\t-")
    }
    spark.stop()
  }
}
