package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.GraftFunctions

/** SparkSessionExtensions entry point: makes the graft expression
  * library available to pure-SQL users via
  * `spark.sql.extensions=graft.GraftExtensions` — no Scala imports
  * needed on the cluster, matching how third-party Spark libraries
  * ship SQL surface.
  *
  * Injects [[GraftFunctions.sqlFunctions]] — the SAME builder list
  * session-level `GraftFunctions.register` uses, so the two SQL
  * registration paths cannot drift apart (they once did: bloom/cms
  * shipped in one but not the other).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.sqlFunctions.foreach { case (name, usage, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, usage, ""),
        builder))
    }
    // SQL UPDATE / MERGE INTO on graft tables — claimed at analysis
    // and routed into the table's atomic verbs (Delta's technique)
    e.injectResolutionRule(session =>
      new graft.sources.GraftRowLevelSql(session))
    // commit-log introspection as SQL table functions
    // (graft_history / graft_files / graft_vacuum_plan)
    graft.sources.GraftTvf.tableFunctions.foreach(e.injectTableFunction)
    // maintenance STATEMENTS (Delta's VACUUM/OPTIMIZE/CLONE/GENERATE
    // family): GRAFT VACUUM / OPTIMIZE / CLONE / GENERATE MANIFEST,
    // parsed by a thin wrapper that delegates everything else
    e.injectParser((_, delegate) =>
      new graft.sources.GraftSqlParser(delegate))
  }
}
