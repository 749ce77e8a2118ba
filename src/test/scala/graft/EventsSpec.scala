package graft

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
