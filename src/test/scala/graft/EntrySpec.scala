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
        operators.Upsert.queries.size + operators.Lakehouse.queries.size
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

  test("g11 envelopes partition the boxes and match an in-memory merge") {
    import org.apache.spark.sql.functions._
    val got = Geometry.g11BoxEnvelope(spark, sf).collect()
      .map(r => r.getAs[Long]("component") ->
        (r.getAs[Long]("n_boxes"), r.getAs[Double]("x1"), r.getAs[Double]("y1"),
         r.getAs[Double]("x2"), r.getAs[Double]("y2"), r.getAs[Double]("score")))
      .toMap
    // in-memory replay: brute intersect graph + union-find + envelope
    val bs = Tables.part(spark, sf).select(
        col("p_partkey"),
        expr("((p_partkey * 131) % 900) / 10").as("x1"),
        expr("((p_partkey * 241) % 900) / 10").as("y1"),
        expr("((p_partkey * 131) % 900) / 10 + cast(p_size % 10 + 2 as double)").as("x2"),
        expr("((p_partkey * 241) % 900) / 10 + cast((p_size * 3) % 10 + 2 as double)").as("y2"),
        expr("cast((p_partkey * 7919) % 1000 as double)").as("score"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
                 r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    val parent = collection.mutable.Map(bs.map(b => b._1 -> b._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (a <- bs; b <- bs if a._1 < b._1)
      if (!(b._4 < a._2 || b._2 > a._4 || b._5 < a._3 || b._3 > a._5)) {
        val (ra, rb) = (find(a._1), find(b._1))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    val expected = bs.groupBy(b => find(b._1)).map { case (comp, grp) =>
      comp -> (grp.length.toLong, grp.map(_._2).min, grp.map(_._3).min,
               grp.map(_._4).max, grp.map(_._5).max, grp.map(_._6).max)
    }
    assert(got == expected, "envelope clusters diverge from union-find replay")
    // envelopes cover every box exactly once
    assert(got.values.map(_._1).sum == bs.length.toLong)
  }

  test("g11 core splits disjoint clusters, keeps singletons, honors touch") {
    // the part-derived boxes at test SF merge into one giant cluster,
    // so the oracle never exercises component SPLITTING — this layout
    // does: a 5-box transitive chain (1∩2∩3∩4∩5, with 1∩3 = ∅), a
    // touch-only pair (10|11 share the edge x=34), and two true
    // singletons. Boxes 4 and 5 co-occupy TWO grid cells (both cross
    // x=16), pinning the distinct-edges dedup.
    import spark.implicits._
    val b = Seq(
      (1L, 0.0, 0.0, 5.0, 5.0, 10.0),
      (2L, 4.0, 4.0, 9.0, 9.0, 20.0),
      (3L, 8.0, 8.0, 13.0, 13.0, 5.0),
      (4L, 12.0, 12.0, 20.0, 15.0, 3.0),
      (5L, 13.0, 12.0, 21.0, 15.0, 4.0),
      (10L, 30.0, 0.0, 34.0, 4.0, 1.0),
      (11L, 34.0, 0.0, 38.0, 4.0, 2.0),
      (20L, 100.0, 100.0, 103.0, 103.0, 7.0),
      (21L, 200.0, 50.0, 204.0, 54.0, 9.0)
    ).toDF("p_partkey", "x1", "y1", "x2", "y2", "score")
    val got = Geometry.envelopeMerge(b).collect()
      .map(r => r.getAs[Long]("component") ->
        (r.getAs[Long]("n_boxes"), r.getAs[Double]("x1"), r.getAs[Double]("y1"),
         r.getAs[Double]("x2"), r.getAs[Double]("y2"), r.getAs[Double]("score")))
      .toMap
    assert(got == Map(
      1L -> ((5L, 0.0, 0.0, 21.0, 15.0, 20.0)),
      10L -> ((2L, 30.0, 0.0, 38.0, 4.0, 2.0)),
      20L -> ((1L, 100.0, 100.0, 103.0, 103.0, 7.0)),
      21L -> ((1L, 200.0, 50.0, 204.0, 54.0, 9.0))))
  }
}
