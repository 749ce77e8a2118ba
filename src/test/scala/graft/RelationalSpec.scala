package graft

import graft.operators.Relational

class RelationalSpec extends SparkSpec {

  test("every relational query has an oracle and returns rows") {
    Relational.queries.foreach { case (name, fn) =>
      assert(Relational.oracles.contains(name), s"$name missing oracle")
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("q1 aggregates are consistent") {
    val rows = Relational.q1Agg(spark, sf).collect()
    assert(rows.length == 6) // 3 returnflags x 2 linestatus in testdata
    rows.foreach { r =>
      val sumQty = r.getAs[Double]("sum_qty")
      val avgQty = r.getAs[Double]("avg_qty")
      val n = r.getAs[Long]("count_order")
      assert(math.abs(sumQty / n - avgQty) < 1e-9)
    }
  }

  test("q2 filter and projection are pushed into the parquet scan") {
    val plan = Relational.q2FilterProject(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("IsNotNull"),
      s"no pushed filters in plan:\n$plan")
    assert(!plan.contains("l_extendedprice"), "projection not pruned")
  }

  test("q3/q16 broadcast their dimension tables") {
    val p3 = Relational.q3JoinAgg(spark, sf).queryExecution.executedPlan.toString
    assert(p3.contains("BroadcastHashJoin"), s"q3 has no broadcast join:\n$p3")
    val p16 = Relational.q16StarJoin(spark, sf).queryExecution.executedPlan.toString
    assert(p16.contains("BroadcastHashJoin"), s"q16 has no broadcast join:\n$p16")
  }

  test("q6 top-k plans as TakeOrderedAndProject (no global sort)") {
    val p = Relational.q6TopK(spark, sf).queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"q6 plan:\n$p")
  }

  test("q8 pagination returns the requested page with a total") {
    val rows = Relational.q8Pagination(spark, sf).collect()
    assert(rows.length == 20)
    val totals = rows.map(_.getAs[Long]("total_count")).distinct
    assert(totals.length == 1 && totals.head > 100)
  }

  test("q7 emits at most 2 rows per customer") {
    val byCust = Relational.q7WindowRank(spark, sf).collect()
      .groupBy(_.getAs[Long]("o_custkey"))
    assert(byCust.values.forall(_.length <= 2))
  }
}
