package graft

import org.apache.spark.sql.functions._
import graft.operators.Events

class EventsSpec extends SparkSpec {

  test("every events query has an oracle and returns rows") {
    Events.queries.foreach { case (name, fn) =>
      assert(Events.oracles.contains(name), s"$name missing oracle")
      assert(fn(spark, sf).count() > 0, s"$name returned no rows")
    }
  }

  test("q21 session counts are bounded by event counts") {
    Events.q21Sessionize(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("n_sessions") <= r.getAs[Long]("n_events"))
    }
  }

  test("q50 bucket decomposition equals the naive range join, no BNLJ") {
    import spark.implicits._
    val got = Events.q50RangeJoin(spark, sf).collect()
      .map(r => r.getAs[Long]("purchase_id") -> r.getAs[Long]("n_clicks")).toMap
    // brute force: the declarative inequality join (BNLJ is fine at
    // this SF — it is exactly the plan q50 exists to avoid)
    val e = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), expr("ts div 1000000000").as("ts_s"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("ts_s").as("start_s"))
    val c = e.filter(col("event_type") === "click").select(col("ts_s").as("click_s"))
    val brute = p.join(c,
        col("click_s") >= col("start_s") && col("click_s") < col("start_s") + 600,
        "left")
      .groupBy("pid").agg(count(col("click_s")).as("n"))
      .collect().map(r => r.getAs[Long]("pid") -> r.getAs[Long]("n")).toMap
    assert(got == brute)
    assert(got.values.sum > 0, "no clicks landed in any window at test SF")
    val plan = Events.q50RangeJoin(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
      "q50 must not plan a nested-loop/cartesian join")
  }

  test("g9 pagerank conserves scaled rank mass and is deterministic") {
    val rows = Events.g9PageRank(Events.membership(spark, sf)).collect()
    val ranks = rows.map(_.getAs[Long]("pagerank"))
    assert(ranks.forall(_ > 0))
    // integer floors only LOSE mass: total stays in (0.9, 1.0] × 1e12
    val total = ranks.sum
    assert(total <= 1000000000000L, s"rank mass grew: $total")
    assert(total > 900000000000L, s"rank mass collapsed: $total")
    // every node keeps at least the damped teleport share
    val byNode = rows.map(r => r.getAs[Long]("node") -> r.getAs[Long]("pagerank")).toMap
    val base = ((1000000000000L / rows.length) * 15) / 100
    assert(byNode.values.forall(_ >= base),
      "a rank fell below the teleport floor")
    // and ranks are not all equal — the structure must show
    assert(byNode.values.toSet.size > 1)
    val again = Events.g9PageRank(Events.membership(spark, sf)).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("pagerank")).toMap
    assert(byNode == again, "pagerank must be bit-deterministic")
  }

  test("g1 components are canonical min labels") {
    // operator takes the graph unbounded — run it on the full membership
    val rows = Events.g1ConnectedComponents(Events.membership(spark, sf)).collect()
    // every component label is itself a member of the component
    val members = rows.map(_.getAs[Long]("user_id")).toSet
    val labels = rows.map(_.getAs[Long]("component")).toSet
    assert(labels.subsetOf(members))
    // a label is the minimum of its component
    rows.groupBy(_.getAs[Long]("component")).foreach { case (c, rs) =>
      assert(rs.map(_.getAs[Long]("user_id")).min == c)
    }
  }
}
