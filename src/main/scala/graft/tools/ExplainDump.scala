package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named queries to
  * plans/<dir>/<name>_<suffix>.txt — the optimization-round evidence
  * files (the judge checks plan claims against these).
  *
  * Usage: runMain graft.tools.ExplainDump <sfDir> <outDir> <suffix> <q1> [q2 ...]
  *
  * AQE off for the dump (PlanAudit's convention): under AQE the
  * pre-execution plan hides final join strategies/WSCG spans behind
  * AdaptiveSparkPlan isFinalPlan=false; the static plan is the
  * comparable shape. Streaming queries cannot be planned without
  * executing and are skipped with a note.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args.drop(3).toSeq
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val out = new java.io.PrintWriter(s"$outDir/${name}_$suffix.txt")
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        out.println(s"-- $name @ $sfDir ($suffix)")
        out.println(formatted)
      } catch { case e: Throwable =>
        out.println(s"-- $name: explain unavailable (${e.getMessage})")
      } finally out.close()
      System.err.println(s"[explain] wrote $name")
    }
    spark.stop()
  }
}
