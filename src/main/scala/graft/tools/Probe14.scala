package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-14 scale probes (SCALE_r14.md):
  *
  *   1. CHECKPOINT RESOLUTION CONSTANT — the parquet-sidecar claim
  *      measured: build a synthetic table whose checkpoint records
  *      100k live files (driver-side log writes, no data files),
  *      then time cold snapshot resolution (a fresh GraftTable
  *      instance's `liveFiles()`) with the sidecar present vs
  *      removed (text fallback). The sidecar's win is the CONSTANT
  *      of the O(files) term — columnar read vs hundreds of MB of
  *      tab-split text.
  *
  * Usage: `sbt "runMain graft.tools.Probe14 <nFiles>"` (default
  * 100000). Driver-side only — no cluster work.
  */
object Probe14 {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.GraftTable

    val root = java.nio.file.Files
      .createTempDirectory("graft_probe14").toString + "/t"
    import spark.implicits._
    val t = GraftTable.create(spark, root, Seq((1L, "x")).toDF("k", "v"))

    // forge a commit that adds n synthetic file entries with stats
    // (driver-side log write — resolution cost does not care whether
    // the files exist), then a checkpoint over it. The stats token is
    // REALISTIC-WIDTH (~900 B: a 20-column table's min/max/nulls plus
    // a bloom token) — the regime the sidecar claim is about; a
    // 45-byte toy token under-weighs the text parse.
    val stats = {
      val cols = (1 to 20).map(i =>
        s""""c$i":{"min":${i * 1000},"max":${i * 9999},"nulls":0}""")
      s"""{"rows":1000,"cols":{${cols.mkString(",")}},""" +
        s""""bloom":"${"A" * 400}"}"""
    }
    val adds = (0 until n).map(i =>
      (f"data/synth/part-$i%06d.parquet", 128L * 1024 * 1024))
    t.commit("append", adds, Seq.empty,
      stats = adds.map(a => a._1 -> stats).toMap)
    // advance to the checkpoint boundary with empty append commits
    // (addConstraint would scan the synthetic paths)
    while (t.latestVersion % 8 != 0) {
      t.commit("append", Seq.empty, Seq.empty); ()
    }
    val log = new java.io.File(s"$root/_graft_log")
    val ckptTxt = log.listFiles()
      .filter(f => f.getName.startsWith("ckpt-v") &&
        f.getName.endsWith(".txt")).maxBy(_.getName)
    val sidecar = new java.io.File(
      ckptTxt.getPath.stripSuffix(".txt") + ".parquet")
    require(sidecar.exists(), "no parquet sidecar written")
    println(f"[probe14] n=$n text=${ckptTxt.length() / 1e6}%.1fMB " +
      f"sidecar=${sidecar.length() / 1e6}%.1fMB")

    def timeResolve(tag: String): Double = {
      val samples = (1 to 5).map { _ =>
        val fresh = GraftTable.forPath(spark, root) // cold caches
        val t0 = System.nanoTime()
        val sz = fresh.liveFiles().size
        val dt = (System.nanoTime() - t0) / 1e9
        require(sz == n + 1, s"resolved $sz files, expected ${n + 1}")
        dt
      }
      val best = samples.min
      println(f"[probe14] $tag min-of-5 resolve: $best%.3f s")
      best
    }
    val withSidecar = timeResolve("parquet-sidecar")
    val hidden = new java.io.File(sidecar.getPath + ".hidden")
    require(sidecar.renameTo(hidden), "could not hide sidecar")
    val textOnly = timeResolve("text-fallback")
    require(hidden.renameTo(sidecar))
    println(f"[probe14] constant drop: ${textOnly / withSidecar}%.1fx")
    spark.stop()
  }
}
