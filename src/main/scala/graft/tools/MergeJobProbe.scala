package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-job breakdown of one clause-merge commit (r18 triage for the
  * s21/q78/q87 lifecycle family): builds the s21-shaped table (orders
  * with status 'O', 8 range files), then runs ONE
  * update-matched/insert-unmatched mergeInto under a job listener and
  * prints every Spark job the verb ran — call site, duration — plus
  * the end-to-end wall time. Run before/after any job-count change to
  * show exactly which passes were removed.
  *
  *   sbt "runMain graft.tools.MergeJobProbe /root/testdata/sf0.1"
  */
object MergeJobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.MergeClauses._

    val orders = graft.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val dir = java.nio.file.Files.createTempDirectory("graft_mjp")
    val t = graft.sources.GraftTable.create(spark, dir.resolve("t").toString,
      orders.filter(col("o_orderstatus") === "O")
        .repartitionByRange(8, col("o_orderkey")))
    val batch = orders.filter(pmod(col("o_orderkey"), lit(3L)) === 0)
      .select(col("o_orderkey"), col("o_orderstatus").as("src_status"),
        (col("o_totalprice") * 2).as("new_price"))
    // warm the session (codegen, parquet footers) with one throwaway merge
    t.mergeInto(batch.limit(10), Seq("o_orderkey"),
      matched = Seq(MatchedUpdate(None,
        Map("o_totalprice" -> expr("s.new_price")))))

    val jobs = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Long, String)]
    val starts = scala.collection.mutable.Map.empty[Int, (Long, String)]
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description"))
            .orElse(Option(j.properties.getProperty("callSite.short")))
            .getOrElse("?"))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, d) =>
          jobs += ((j.jobId, System.nanoTime() - t0, d)); ()
        }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    t.mergeInto(batch, Seq("o_orderkey"),
      matched = Seq(MatchedUpdate(None,
        Map("o_totalprice" -> expr("s.new_price")))),
      notMatched = Seq(NotMatchedInsert(None,
        Map("o_orderkey" -> expr("s.o_orderkey"),
          "o_orderstatus" -> expr("s.src_status"),
          "o_totalprice" -> expr("s.new_price")))))
    val wall = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(500) // drain listener bus
    println(f"[merge-probe] wall ${wall}%.3f s, ${jobs.size} jobs")
    jobs.sortBy(_._1).foreach { case (id, ns, d) =>
      println(f"[merge-probe]   job $id%3d ${ns / 1e6}%8.1f ms  $d")
    }
    spark.stop()
  }
}
