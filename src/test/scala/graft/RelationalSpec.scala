package graft

import graft.operators.Relational

class RelationalSpec extends SparkSpec {

  test("every relational query has an oracle and returns rows") {
    // rows-only by design: HLL / quantile-sketch estimates aren't
    // SQL-oracle-stable; dedicated tests pin plan shape + error bound
    val rowsOnly = Set("q47b_table_profile_approx", "q70_approx_percentile")
    Relational.queries.foreach { case (name, fn) =>
      assert(rowsOnly.contains(name) || Relational.oracles.contains(name),
        s"$name missing oracle")
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

  test("q48 gates required fields and skips optional suffixes") {
    val rows = Relational.q48BuildTag(spark, sf).collect()
    rows.foreach { r =>
      val k = r.getAs[Long]("p_partkey")
      val tag = r.getAs[String]("tag_no")
      r.getAs[String]("tag_type") match {
        case "equipment" => // func missing when k%7==0 → whole tag NULL
          if (k % 7 == 0) assert(tag == null, s"k=$k expected NULL, got $tag")
          else assert(tag.matches("^\\d+_F\\d-\\d+(-A)?(-B)?$"), s"k=$k: $tag")
        case "line" =>
          if (k % 11 == 0) assert(tag == null, s"k=$k expected NULL, got $tag")
          else assert(tag.matches("^\\d+_\\d+-C\\d-FL\\d-\\d+$"), s"k=$k: $tag")
        case "cable" => // all required fields derivable → never NULL
          assert(tag != null && tag.matches("^\\d+_P\\d-\\d+(-A)?(-B)?$"),
            s"k=$k: $tag")
      }
    }
    // the optional-suffix skip path actually fires both ways
    assert(rows.exists(r => r.getAs[String]("tag_no") != null &&
      r.getAs[String]("tag_no").endsWith("-A-B")))
    assert(rows.exists(r => r.getAs[String]("tag_type") == "cable" &&
      !r.getAs[String]("tag_no").contains("-A")))
  }

  test("q47b profiles in one scan without Expand, within HLL error of exact") {
    val plan = Relational.q47bTableProfileApprox(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"approx profile still expands:\n$plan")
    val exactPlan = Relational.q47TableProfile(spark, sf)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"),
      "q47 no longer expands — retire q47b's rationale comment")
    val exact = Relational.q47TableProfile(spark, sf).collect()
      .map(r => r.getAs[String]("column_name") -> r.getAs[Long]("n_distinct")).toMap
    Relational.q47bTableProfileApprox(spark, sf).collect().foreach { r =>
      val c = r.getAs[String]("column_name")
      val est = r.getAs[Long]("n_distinct").toDouble
      val truth = exact(c).toDouble
      assert(math.abs(est - truth) / truth <= 0.10,
        f"$c: approx $est%.0f vs exact $truth%.0f")
    }
  }

  test("q49 pushes the coarse change-window into every entity scan") {
    val plan = Relational.q49IncrementalSync(spark, sf)
      .queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllIn(plan).length
    val pushed = "PushedFilters: \\[[^\\]]".r.findAllIn(plan).length
    assert(scans == 3, s"expected 3 entity scans, got $scans:\n$plan")
    assert(pushed == scans,
      s"coarse window not pushed into all scans ($pushed/$scans):\n$plan")
    // residual COALESCE filter is tighter than the coarse window: rows
    // with updated in [lo-maxLate, lo) and no correction must be gone
    val lo = 801964800000000L // 1995-06-01 UTC in epoch micros
    Relational.q49IncrementalSync(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("changed_at_us") >= lo)
    }
  }

  test("q62 cohorts partition the click-days; set ops plan as semi/anti") {
    import org.apache.spark.sql.functions._
    val rows = Relational.q62IntersectExcept(spark, sf).collect()
      .map(r => (r.getAs[String]("cohort"), r.getAs[Long]("user_id"),
        r.getAs[Long]("day")))
    val both = rows.filter(_._1 == "click_and_purchase").map(t => (t._2, t._3)).toSet
    val only = rows.filter(_._1 == "click_no_purchase").map(t => (t._2, t._3)).toSet
    assert(both.nonEmpty && only.nonEmpty, "a cohort is empty — degenerate")
    assert((both & only).isEmpty, "INTERSECT and EXCEPT results overlap")
    val clickDays = graft.Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .selectExpr("user_id", "ts div 86400000000000 as day").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((both ++ only) == clickDays,
      "cohorts do not partition the distinct click-day set")
    val plan = Relational.q62IntersectExcept(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
      "set ops must plan as hash semi/anti joins")
  }

  test("q65 composed search keeps the scalar-join count form (no window)") {
    val df = Relational.q65SearchPage(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the reference's COUNT(*) OVER() would appear as a Window with an
    // empty partition spec — the one-partition funnel; the composed
    // plan must instead broadcast a 1-row scalar aggregate over a
    // TakeOrderedAndProject page
    assert(!plan.contains("Window"), s"q65 planned a window:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"q65 plan:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin"), s"q65 plan:\n$plan")
    val rows = df.collect()
    assert(rows.length == 10, "page size")
    val total = rows.head.getAs[Long]("total_count")
    assert(rows.forall(_.getAs[Long]("total_count") == total))
    // the page is rows 21-30 of the filtered, ordered listing
    import org.apache.spark.sql.functions._
    val all = graft.Tables.part(spark, sf)
      .filter(col("p_size") < 30 &&
        (lower(col("p_name")).contains("red") ||
         lower(col("p_type")).contains("brass") ||
         lower(col("p_brand")).contains("3")))
    assert(total == all.count())
    val expected = all
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
      .collect().slice(20, 30).map(_.getAs[Long]("p_partkey")).toSeq
    assert(rows.map(_.getAs[Long]("p_partkey")).toSeq == expected)
  }

  test("q68 unpivot melts losslessly and plans map-only (Expand, no window)") {
    import org.apache.spark.sql.functions._
    val df = Relational.q68Unpivot(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"unpivot should plan as Expand:\n$plan")
    assert(!plan.contains("Window"), "no window belongs in a melt")
    val parts = graft.Tables.part(spark, sf)
      .select("p_partkey", "p_brand", "p_type", "p_name").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getString(3)))
      .toMap
    val rows = df.collect()
    assert(rows.length == parts.size * 3, "one output row per (part, attr)")
    rows.foreach { r =>
      val (brand, typ, name) = parts(r.getAs[Long]("p_partkey"))
      val want = r.getAs[String]("attr") match {
        case "p_brand" => brand
        case "p_type" => typ
        case "p_name" => name
      }
      assert(r.getAs[String]("val") == want)
    }
  }

  test("q71 top-k per group: no window exchange, equals the window form") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val df = Relational.q71TopkPerGroup(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"bounded top-k must not plan a window sort:\n$plan")
    assert(plan.contains("ObjectHashAggregate"), s"q71 plan:\n$plan")
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val win = graft.Tables.orders(spark, sf)
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 2)
      .select(col("o_custkey"), col("rnk").cast("long").as("rnk"),
        col("o_orderkey"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getDouble(3))).toSet
    assert(got == win, "bounded aggregate diverged from the window form")
  }

  test("q70 sketch percentiles bound to exact; plan holds bounded state") {
    import org.apache.spark.sql.functions._
    val df = Relational.q70ApproxPercentile(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"sketch should aggregate, not sort:\n$plan")
    assert(!plan.contains("Window"), "no window belongs in a sketch pass")
    val got = df.collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    // exact per-group percentiles from the raw values
    val raw = graft.Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_extendedprice").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def exact(vs: Array[Double], p: Double): Double = {
      // Spark's `percentile` interpolation (1-based rank p*(n-1)+1)
      val rank = p * (vs.length - 1)
      val lo = rank.toInt
      if (lo + 1 >= vs.length) vs.last
      else vs(lo) + (rank - lo) * (vs(lo + 1) - vs(lo))
    }
    got.foreach { case (flag, (p50, p95, p99)) =>
      val vs = raw(flag)
      Seq(0.5 -> p50, 0.95 -> p95, 0.99 -> p99).foreach { case (p, est) =>
        val ex = exact(vs, p)
        // GK at accuracy 10000 over ~2k-row groups is near-exact; allow
        // 1% relative slack for the rank-vs-interpolation difference
        assert(math.abs(est - ex) <= math.max(1.0, ex * 0.01),
          s"$flag p$p: est=$est exact=$ex")
      }
    }
  }

  test("q63 threshold rows equal an in-engine recomputation") {
    import org.apache.spark.sql.functions._
    val got = Relational.q63ScalarSubquery(spark, sf).collect()
    assert(got.forall(_.getAs[Double]("above_by") > 0))
    val p = graft.Tables.part(spark, sf)
    val avg = p.agg((sum(col("p_retailprice").cast("decimal(18,2)")) /
      count(lit(1))).cast("double")).collect().head.getDouble(0)
    assert(got.length == p.filter(col("p_retailprice") > avg).count().toInt)
    assert(got.forall(_.getAs[Double]("avg_price") == avg))
  }
}
