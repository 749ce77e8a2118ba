package graft

import graft.tools.PlanInvariants

/** Red if any batch query's plan reintroduces a flagged scale-killer
  * shape (unhinted cartesian, unbounded low-cardinality window).
  * Streaming queries are excluded: building their DataFrame executes
  * the stream, and their stateful plans are shape-checked by their
  * own specs.
  */
class PlanInvariantsSpec extends SparkSpec {

  test("no batch query plan contains a scale-killer shape") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(_._1.startsWith("s"))
      .flatMap { case (name, fn) =>
        PlanInvariants.violations(fn(spark, sf)).map(v => s"$name: $v")
      }
    assert(bad.isEmpty, s"scale-killer plan shapes:\n${bad.mkString("\n")}")
  }

  test("the checker flags the shapes it exists to catch (not vacuous)") {
    // q42's retired window form IS the unbounded low-card window
    val windowForm = graft.operators.Analytics.q42NtileWindow(spark, sf)
    assert(PlanInvariants.unboundedWindows(windowForm).nonEmpty,
      "q42 window form should be flagged")
    // an unhinted cross join IS the cartesian
    val a = Tables.orders(spark, sf).select("o_orderkey")
    val b = Tables.part(spark, sf).select("p_partkey")
    assert(PlanInvariants.unhintedCartesians(a.crossJoin(b)).nonEmpty,
      "unhinted cross join should be flagged")
    // d1's retired groupBy(text) IS the text-keyed shuffle
    import org.apache.spark.sql.functions.{col, count, lit, min}
    val textGrouped = Tables.documents(spark, sf)
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
    assert(PlanInvariants.textKeyedShuffles(textGrouped).nonEmpty,
      "groupBy(text) should be flagged as a text-keyed shuffle")
  }
}
