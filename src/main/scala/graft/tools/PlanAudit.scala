package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Plan audit (SURVEY.md §5): prints condensed physical-plan
  * diagnostics for every query — shuffle count, broadcast joins,
  * whole-stage-codegen coverage, pushed filters, scanned columns —
  * the checklist the 100 TB design is graded on.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    // optional trailing query names: audit only those (the scale runs
    // fingerprint the probe set at 10x/100x, where building all 161
    // queries would execute every iterative loop's build step)
    val only = args.drop(1).toSet
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")  // show final WSCG stages statically
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        def n(pat: String) = pat.r.findAllIn(plan).length
        val shuffles = n("Exchange hashpartitioning") + n("Exchange rangepartitioning")
        val bhj = n("BroadcastHashJoin")
        val smj = n("SortMergeJoin")
        val wsc = n("\\*\\(\\d+\\)")  // WholeStageCodegen stage markers
        // one count per scan with ANY pushed filter (summing two
        // pattern counts double-counted scans matching both)
        val pushed = n("PushedFilters: \\[[^\\]]")
        val scans = n("FileScan parquet")
        println(f"$name%-26s shuffles=$shuffles%-3d bhj=$bhj%-2d smj=$smj%-2d wscg=$wsc%-3d scans=$scans%-2d pushedFilterScans=$pushed")
      } catch { case e: Throwable =>
        // only streaming queries are EXPECTED to fail plan capture
        // (building them executes the stream); a batch failure is a
        // regression and must not masquerade as a skip
        if (name.startsWith("s"))
          println(f"$name%-26s AUDIT-SKIP (streaming: building executes the query)")
        else
          println(f"$name%-26s AUDIT-FAIL ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
