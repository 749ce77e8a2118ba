package graft

import graft.operators.Analytics

class AnalyticsSpec extends SparkSpec {

  test("q42 two-pass rank computation is bit-identical to the window form") {
    val twoPass = Analytics.q42Ntile(spark, sf).collect()
    val window = Analytics.q42NtileWindow(spark, sf).collect()
    assert(twoPass.length == window.length)
    twoPass.zip(window).foreach { case (a, b) =>
      assert(a == b, s"two-pass $a != window $b")
    }
  }

  test("q42 two-pass plan has no window partitioned only by o_orderstatus") {
    val plan = Analytics.q42Ntile(spark, sf)
      .queryExecution.optimizedPlan.toString
    // the scale-killer shape is `windowspecdefinition(o_orderstatus#…,
    // o_totalprice…)` — ours must always include the bucket key
    val windows = plan.linesIterator.filter(_.contains("windowspecdefinition")).toList
    assert(windows.nonEmpty, s"expected bounded windows in plan:\n$plan")
    windows.filter(_.contains("o_totalprice")).foreach { l =>
      assert(l.contains("bkt"), s"ntile window not bucket-bounded: $l")
    }
  }

  test("q55 every grouping set partitions the input: per-gid counts sum to N") {
    val total = graft.Tables.orders(spark, sf).count()
    val rows = Analytics.q55GroupingSets(spark, sf).collect()
    val byGid = rows.groupBy(_.getAs[Long]("gid"))
    assert(byGid.keySet == Set(0L, 1L, 2L, 3L), "expected all 4 grouping sets")
    byGid.foreach { case (gid, rs) =>
      assert(rs.map(_.getAs[Long]("n")).sum == total,
        s"grouping set gid=$gid does not partition the input")
    }
    assert(byGid(3L).length == 1, "the () set must be a single row")
  }

  test("q56 islands equal an in-memory consecutive-run replay") {
    val got = Analytics.q56GapsIslands(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_active_days"), r.getAs[Long]("n_streaks"),
         r.getAs[Long]("longest_streak"))).toMap
    val days = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "ts div 86400000000000 as day").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toList).toMap
    val expected = days.map { case (u, ds) =>
      // split the sorted day list on any gap > 1
      val runs = ds.tail.foldLeft(List(List(ds.head))) { (acc, d) =>
        if (d == acc.head.head + 1) (d :: acc.head) :: acc.tail
        else List(d) :: acc
      }
      u -> (ds.length.toLong, runs.length.toLong, runs.map(_.length).max.toLong)
    }
    assert(got == expected, "islands diverge from in-memory run splitting")
    // a real streak exists at test SF or the operator is untested
    assert(got.values.exists(_._3 > 1), "no multi-day streak in corpus")
  }

  test("q57 suite replays exactly and referential checks are sound") {
    val got = Analytics.q57DqSuite(spark, sf).collect()
      .map(r => r.getAs[String]("chk") -> r.getAs[Long]("violations")).toMap
    assert(got.size == 8, s"expected 8 checks, got ${got.keySet}")
    assert(got.values.forall(_ >= 0))
    // independent replays of one scan check and one referential check
    val qty = graft.Tables.lineitem(spark, sf)
      .filter("l_quantity < 1 or l_quantity > 50").count()
    assert(got("lineitem_qty_out_of_range") == qty)
    import org.apache.spark.sql.functions.col
    val fk = graft.Tables.orders(spark, sf)
      .join(graft.Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"), "left_anti").count()
    assert(got("orders_fk_customer") == fk)
  }

  test("q60 histogram partitions the events and clamps the top bucket") {
    val rows = Analytics.q60Histogram(spark, sf).collect()
    val total = graft.Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total,
      "histogram buckets do not partition the input")
    assert(rows.forall(r => (0L to 9L).contains(r.getAs[Long]("bucket"))))
    assert(rows.map(_.getAs[Long]("bucket")).distinct.length > 3,
      "value range degenerate at test SF")
  }

  test("q61 incremental apply equals the full rebuild; untouched keys intact") {
    import org.apache.spark.sql.functions._
    val applied = Analytics.q61Scd2Apply(spark, sf).collect()
    val rebuilt = Analytics.q41Scd2(spark, sf).collect()
    // row-SET equality (r18: the operators no longer presentation-sort)
    assert(applied.map(_.toString).sorted.sameElements(
        rebuilt.map(_.toString).sorted),
      "incremental SCD2 apply diverges from the full-history rebuild")
    // keys with no batch rows keep their open row open
    val batchKeys = graft.Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    assert(batchKeys.nonEmpty && batchKeys.size < 150,
      "cutoff degenerate: batch touches no/every key")
    val opens = applied.filter(_.isNullAt(3)).map(_.getLong(0)).toSet
    val untouched = applied.map(_.getLong(0)).toSet -- batchKeys
    assert(untouched.subsetOf(opens),
      "an untouched key lost its open row during apply")
  }

  test("q64 spine is dense and the two fills behave on real gaps") {
    val rows = Analytics.q64GapFill(spark, sf).collect()
    val byNation = rows.groupBy(_.getAs[String]("n_name"))
    assert(byNation.size == 25, "spine must cover every dimension row")
    val span = rows.map(_.getAs[Long]("day"))
    val len = span.max - span.min + 1
    byNation.foreach { case (n, rs) =>
      assert(rs.length.toLong == len, s"$n spine not dense")
      val days = rs.map(_.getAs[Long]("day")).sorted
      assert(days.zip(days.tail).forall { case (a, b) => b == a + 1 },
        s"$n has a calendar hole")
    }
    // a genuine gap day: zero-filled measure but a carried-forward
    // last observation — the two fills must disagree there
    assert(rows.exists { r =>
      r.getAs[Double]("revenue") == 0.0 && !r.isNullAt(3) &&
        r.getAs[Double]("last_seen_revenue") > 0.0
    }, "no gap day observed — fills untested")
    // before a nation's first observation LOCF is null, zero-fill 0
    assert(rows.exists(r => r.isNullAt(3) && r.getAs[Double]("revenue") == 0.0),
      "no leading-null LOCF rows — boundary untested")
  }

  test("q58 answer is invariant to day-sliced incremental state merges") {
    import org.apache.spark.sql.functions._
    val direct = Analytics.q58IncrementalAgg(spark, sf).collect()
    // replay: build the daily state in two arbitrary day-slices (odd /
    // even days — the 'yesterday's state + today's partials' shape),
    // merge the partials, then roll up. Must be bit-identical: count
    // and DECIMAL-sum are commutative monoids.
    val ev = graft.Tables.events(spark, sf)
      .select(expr("ts div 86400000000000").as("day"), col("event_type"),
        col("value"))
    val slice = (p: String) => ev.filter(expr(p))
      .groupBy("day", "event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("sv"))
    val merged = slice("day % 2 = 0").unionByName(slice("day % 2 = 1"))
      .groupBy("day", "event_type")
      .agg(sum(col("n")).as("n"), sum(col("sv")).as("sv"))
      .groupBy(trunc(date_add(lit("1970-01-01").cast("date"),
          col("day").cast("int")), "month").as("month"), col("event_type"))
      .agg(sum(col("n")).as("n_events"),
        sum(col("sv")).cast("double").as("sum_value"),
        (sum(col("sv")).cast("double") / sum(col("n"))).as("avg_value"))
      .orderBy("month", "event_type")
      .collect()
    assert(direct.sameElements(merged),
      "incremental state merge diverged from the direct aggregation")
  }
}
