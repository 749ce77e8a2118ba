package graft

import org.apache.spark.sql.functions._
import graft.operators.Events

class EventsSpec extends SparkSpec {

  test("every events query has an oracle and returns rows") {
    // rows-only by design: HLL sketch internals aren't SQL-expressible;
    // the dedicated q52 test below pins estimates + monotonicity
    val rowsOnly = Set("q52_cumulative_distinct")
    Events.queries.foreach { case (name, fn) =>
      assert(rowsOnly.contains(name) || Events.oracles.contains(name),
        s"$name missing oracle")
      assert(fn(spark, sf).count() > 0, s"$name returned no rows")
    }
  }

  test("q52 sketch estimates track exact cumulative distincts") {
    val rows = Events.q52CumulativeDistinct(spark, sf).collect()
    val e = graft.Tables.events(spark, sf)
      .select(date_format(expr("timestamp_micros(ts div 1000)"),
        "yyyy-MM-dd").as("day"), col("user_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val days = rows.map(_.getAs[String]("day"))
    assert(days.sameElements(days.sorted))
    var cumPrev = 0L
    days.foreach { day =>
      val r = rows.find(_.getAs[String]("day") == day).get
      val exactDaily = e.filter(_._1 == day).map(_._2).distinct.length.toLong
      val exactCum = e.filter(_._1 <= day).map(_._2).distinct.length.toLong
      val daily = r.getAs[Long]("daily_users")
      val cum = r.getAs[Long]("cum_users")
      // lgK=12 HLL: relative error ~1.6%; allow 5% plus small-count slack
      assert(math.abs(daily - exactDaily) <= math.max(2, exactDaily / 20),
        s"$day daily $daily vs exact $exactDaily")
      assert(math.abs(cum - exactCum) <= math.max(2, exactCum / 20),
        s"$day cumulative $cum vs exact $exactCum")
      assert(cum >= cumPrev, s"$day cumulative estimate regressed")
      cumPrev = cum
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
