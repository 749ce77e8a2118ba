package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 scale probe (SCALE_r15.md): STREAM ADMISSION CONTROL —
  * the bounded-bootstrap/recovery claim, measured.
  *
  * Build a graft table from sf lineitem as several multi-file append
  * commits, then bootstrap a stream over it from version 0 two ways:
  *
  *   1. UNBOUNDED (pre-r15 behavior): one corpus-sized micro-batch.
  *      Inject a failure after the batch's work is done but before
  *      its foreachBatch completes — the restart replays EVERYTHING
  *      (the crash-at-99% shape).
  *   2. maxFilesPerTrigger=N: ceil(files/N) bounded batches, each
  *      individually checkpointed. Inject the failure at the LAST
  *      batch — the restart replays only that batch's files.
  *
  * Output: rows/files per run, batch counts, wall times, and the
  * REPLAYED row counts after the injected failure — the number the
  * admission-control claim is about. `sbt "runMain graft.tools
  * .Probe15 [sfDir]"`.
  */
object Probe15 {
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

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    val root = java.nio.file.Files
      .createTempDirectory("graft_probe15").toString + "/t"
    // 4 commits × 8 files: the multi-commit history a catch-up spans
    val t = GraftTable.create(spark, root,
      li.filter(col("l_orderkey") % 4 === 0).repartition(8))
    (1 to 3).foreach(i =>
      t.append(li.filter(col("l_orderkey") % 4 === i).repartition(8)))
    val nFiles = t.liveFiles().size
    val total = li.count()
    println(s"[probe15] table: $total rows, $nFiles files, " +
      s"${t.latestVersion} commits")

    /** Bootstrap from v0; fail once inside foreachBatch at `failAt`
      * (AFTER the batch's rows are counted — the work is done, the
      * offset commit is not), restart, drain. Returns (batches,
      * rows-before-failure, rows-replayed-after-restart, wall-sec).
      */
    def bootstrap(cap: Option[Int],
                  failAt: Long): (Int, Long, Long, Double) = {
      val ckpt = java.nio.file.Files
        .createTempDirectory("probe15_ck").toString
      val seen = new java.util.concurrent.atomic.AtomicLong(0L)
      val replayed = new java.util.concurrent.atomic.AtomicLong(0L)
      val batches = new java.util.concurrent.atomic.AtomicLong(0L)
      val failed = new java.util.concurrent.atomic.AtomicBoolean(false)
      val t0 = System.nanoTime()
      def run(counter: java.util.concurrent.atomic.AtomicLong): Unit = {
        val reader = cap.foldLeft(spark.readStream.format("graft"))(
          (r, n) => r.option("maxFilesPerTrigger", n.toString))
        val q = reader.load(root)
          .writeStream.option("checkpointLocation", ckpt)
          .foreachBatch { (b: DataFrame, id: Long) =>
            counter.addAndGet(b.count())
            batches.incrementAndGet()
            if (id == failAt && failed.compareAndSet(false, true))
              sys.error("injected failure")
            ()
          }.start()
        try q.processAllAvailable() finally q.stop()
      }
      try run(seen) catch { case _: Throwable => () }
      run(replayed)
      (batches.get().toInt, seen.get(), replayed.get(),
        (System.nanoTime() - t0) / 1e9)
    }

    // unbounded: ONE corpus batch; fail it → restart replays the corpus
    val (b1, s1, r1, w1) = bootstrap(None, failAt = 0L)
    println(f"[probe15] unbounded: $b1 batch attempts, $s1 rows done " +
      f"before the failure, $r1 rows REPLAYED, $w1%.1f s wall")
    // capped: 8 bounded batches; fail the last → restart replays one
    val cap = math.max(1, nFiles / 8)
    val (b2, s2, r2, w2) = bootstrap(Some(cap), failAt = (nFiles / cap) - 1L)
    println(f"[probe15] maxFilesPerTrigger=$cap: $b2 batch attempts, " +
      f"$s2 rows done before the failure, $r2 rows REPLAYED, $w2%.1f s wall")
    println(f"[probe15] replay ratio unbounded/capped: ${r1.toDouble / math.max(1L, r2)}%.1f x")
    spark.stop()
  }
}
