package graft

import org.apache.spark.sql.functions._
import graft.operators.Events

class EventsSpec extends SparkSpec {

  test("every events query has an oracle and returns rows") {
    // rows-only by design: HLL sketch internals aren't SQL-expressible;
    // the dedicated q52 test below pins estimates + monotonicity
    val rowsOnly = Set("q52_cumulative_distinct")
    val oracled = Events.oracles.keySet ++ Events.bucketedOracles.keySet
    Events.queries.foreach { case (name, fn) =>
      assert(rowsOnly.contains(name) || oracled.contains(name),
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
    // bucketWidthS is a PHYSICAL knob only: any width (here a
    // non-divisor of the window) must leave the answer untouched —
    // the semantic windowS predicate refines in-join
    val reTuned = Events.q50RangeJoin(spark, sf, windowS = 600,
        bucketWidthS = 250).collect()
      .map(r => r.getAs[Long]("purchase_id") -> r.getAs[Long]("n_clicks")).toMap
    assert(reTuned == got, "bucket width changed the query's meaning")
  }

  test("q59 attribution equals the naive EXISTS semantics in memory") {
    val evs = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "event_type", "ts div 1000 as ts_us").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    val w = 172800000000L
    val expected = evs.map { case (u, es) =>
      val views = es.filter(_._2 == "view").map(_._3)
      val clicks = es.filter(_._2 == "click").map(_._3)
      val purchases = es.filter(_._2 == "purchase").map(_._3)
      val attributed = purchases.count(p => clicks.exists(c => c < p &&
        views.exists(v => v < c && p - v <= w)))
      u -> (purchases.length.toLong, attributed.toLong)
    }.filter(_._2._1 > 0)
    val got = Events.queries("q59_seq_pattern")(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_purchases"), r.getAs[Long]("n_attributed"))).toMap
    assert(got == expected, "window-pass attribution diverges from EXISTS")
    // the pattern must discriminate at test SF: some but not all
    // purchases carry a full ordered chain
    val (tot, att) = got.values.foldLeft((0L, 0L)) {
      case ((t, a), (p, x)) => (t + p, a + x) }
    assert(att > 0 && att < tot, s"degenerate attribution $att/$tot")
  }

  test("g12 costs equal an in-memory Bellman-Ford and detours matter") {
    val edges = Events.g12Graph(spark, sf, maxUser = 60).collect()
      .map(r => (r.getAs[Long]("x"), r.getAs[Long]("y"), r.getAs[Long]("w")))
    val seeds = edges.map(_._1).distinct.filter(_ < 5)
    val adj = edges.groupBy(_._1).view.mapValues(_.map(e => (e._2, e._3))).toMap
    val expected = seeds.flatMap { s =>
      var dist = Map(s -> 0L)
      (1 to 3).foreach { _ =>
        val ext = dist.toSeq.flatMap { case (n, c) =>
          adj.getOrElse(n, Array.empty[(Long, Long)]).map { case (y, w) => y -> (c + w) }
        }
        dist = (dist.toSeq ++ ext).groupBy(_._1).view
          .mapValues(_.map(_._2).min).toMap
      }
      dist.collect { case (n, c) if n != s => (s, n) -> c }
    }.toMap
    val got = Events.queries("g12_sssp")(spark, sf).collect()
      .map(r => (r.getAs[Long]("seed"), r.getAs[Long]("node")) ->
        r.getAs[Long]("cost")).toMap
    assert(got == expected, "SSSP diverges from in-memory Bellman-Ford")
    // the relaxation must be doing real work: some best cost strictly
    // beats that pair's direct edge (a multi-hop detour won)
    val direct = edges.map(e => (e._1, e._2) -> e._3).toMap
    assert(got.exists { case (k, c) => direct.get(k).exists(c < _) },
      "no multi-hop path ever beat a direct edge — weights degenerate")
  }

  test("g13 peel rounds match an in-memory replay and actually peel") {
    // support>=2 co-purchase edges, replayed eagerly (a lazy view
    // here silently miscounts pair multiplicities)
    val items = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairs = items.groupBy(_._1).values.toList.flatMap { grp =>
      val ps = grp.map(_._2).distinct.sorted
      (for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))).toList
    }
    // filter(...).keySet, NOT collect{case (e, _) => e}: a collect
    // producing tuples from a Map REBUILDS a Map, silently collapsing
    // edges that share a left endpoint
    val sup = pairs.groupBy(identity).filter(_._2.size >= 2).keySet
    def replay(k: Int): (Map[Long, Long], List[Int]) = {
      var sym = sup.toList.flatMap { case (a, b) => List((a, b), (b, a)) }
      var removed = List.empty[Int]
      (1 to 3).foreach { _ =>
        val deg = sym.groupBy(_._1).view.mapValues(_.size).toMap
        val keep = deg.filter(_._2 >= k).keySet
        removed :+= (deg.size - keep.size)
        sym = sym.filter { case (x, y) => keep(x) && keep(y) }
      }
      (sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap, removed)
    }
    // the oracled instance (k=3): exact match — degenerate at
    // sf0.001 (min support-degree > 3, nothing peels), still exact
    val got3 = Events.queries("g13_kcore_peel")(spark, sf).collect()
      .map(r => r.getAs[Long]("p_partkey") -> r.getAs[Long]("core_deg")).toMap
    assert(got3 == replay(3)._1, "k=3 peel diverges from replay")
    // a k inside the degree distribution so the peel does real work
    // (sf0.001 support-degrees run ~5..51; 24 removes ~half round 1)
    val gotK = Events.g13KcorePeel(spark, sf, k = 24).collect()
      .map(r => r.getAs[Long]("p_partkey") -> r.getAs[Long]("core_deg")).toMap
    val (expK, removedK) = replay(24)
    assert(gotK == expK, "k=24 peel diverges from replay")
    assert(removedK.head > 0, s"k=24 removed nothing: $removedK")
    assert(gotK.size < got3.size, "higher k must peel strictly more")
  }

  test("g13b fixpoint == 3 rounds where converged; deeper cascades keep peeling") {
    import spark.implicits._
    def sym(edges: Seq[(Long, Long)]) =
      edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("x", "y")
    def run(edges: Seq[(Long, Long)], k: Int, rounds: Int): Map[Long, Long] = {
      var s = sym(edges)
      (1 to rounds).foreach { _ =>
        val keep = s.groupBy("x").agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= k).select("x")
        s = s.join(keep, Seq("x"), "left_semi")
          .join(keep.withColumnRenamed("x", "y"), Seq("y"), "left_semi")
      }
      s.groupBy("x").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    def fix(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] =
      Events.kcorePeelFixpoint(sym(edges), k).collect()
        .map(r => r.getAs[Long]("p_partkey") -> r.getAs[Long]("core_deg")).toMap
    // triangle + pendant: one round peels the pendant, round two is a
    // no-op — fixpoint and the 3-round contract agree
    val triPend = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    assert(fix(triPend, 2) == run(triPend, 2, 3))
    assert(fix(triPend, 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // 8-node chain at k=2: endpoints peel one PAIR per round — after
    // 3 rounds one edge still stands, the fixpoint is empty. This is
    // the cascade the fixed-round contract cannot finish.
    val chain = (1L until 8L).map(i => (i, i + 1))
    assert(run(chain, 2, 3).nonEmpty, "3 rounds already drained the chain")
    assert(fix(chain, 2).isEmpty, "the 2-core of a chain must be empty")
    // on the real corpus the oracled g13b (k=3) is the fixed point of
    // one more peel round: re-peeling its survivors changes nothing
    val g13b = Events.queries("g13b_kcore_fixpoint")(spark, sf).collect()
      .map(r => r.getAs[Long]("p_partkey") -> r.getAs[Long]("core_deg")).toMap
    assert(g13b.values.forall(_ >= 3), "a 3-core survivor with degree < 3")
  }

  test("q72 hopping windows conserve events 4x and refine the tumbling counts") {
    val rows = Events.queries("q72_hopping_window")(spark, sf).collect()
    val nEvents = graft.Tables.events(spark, sf).count()
    // width/slide = 4: every event lands in exactly 4 windows
    assert(rows.map(_.getAs[Long]("n")).sum == 4 * nEvents,
      "hopping multi-assignment lost or duplicated events")
    // the epoch-aligned hour windows (start % 3600 == 0) are exactly
    // the tumbling q22 windows — counts must agree per (hour, type)
    val hourly = rows.filter(_.getAs[Long]("win_start_s") % 3600 == 0)
      .map(r => (r.getAs[Long]("win_start_s"), r.getString(1)) -> r.getAs[Long]("n"))
      .toMap
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:00").withZone(java.time.ZoneOffset.UTC)
    val q22 = Events.q22EventWindow(spark, sf).collect()
      .map(r => (r.getAs[String]("hour"), r.getAs[String]("event_type"))
        -> r.getAs[Long]("n")).toMap
    val hourlyByStr = hourly.map { case ((s0, t), n) =>
      (fmt.format(java.time.Instant.ofEpochSecond(s0)), t) -> n }
    assert(q22.nonEmpty && hourlyByStr.nonEmpty)
    assert(hourlyByStr == q22,
      "epoch-aligned hopping windows diverge from the tumbling counts")
  }

  test("q67 outlier flags equal a double-precision 3-sigma replay") {
    val ev = graft.Tables.events(spark, sf)
      .select("event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    // replicate the fixing step (micro-units), then test in exact
    // BigInt arithmetic — the operator's claim is that this decision
    // is what 3-sigma means once values are fixed to 1e-6
    val v6 = ev.map { case (id, t, v) => (id, t, BigInt(math.round(v * 1e6))) }
    val byType = v6.groupBy(_._2)
    val flags = v6.map { case (id, t, x) =>
      val xs = byType(t).map(_._3)
      val n = BigInt(xs.length); val sSum = xs.sum
      val q = xs.map(x2 => x2 * x2).sum
      val dev = x * n - sSum
      id -> (dev * dev > 9 * (n * q - sSum * sSum))
    }.toMap
    val got = Events.queries("q67_value_outliers")(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Boolean]("is_outlier")).toMap
    assert(got == flags, "outlier flags diverge from the BigInt replay")
    assert(got.values.exists(identity) && got.values.exists(!_),
      "degenerate: outliers should exist but not dominate")
  }

  test("q69 PIT join equals an in-memory as-of replay and keeps its equi key") {
    // the interval form must agree with the as-of definition: the
    // latest non-purchase event at-or-before the purchase (ties on
    // ts: the event with that ts, largest event_id per lead ordering)
    val ev = graft.Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3) / 1000))
    val byUser = ev.filter(_._3 != "purchase").groupBy(_._2)
    val expect = ev.filter(_._3 == "purchase").map { case (pid, u, _, t) =>
      val past = byUser.getOrElse(u, Array.empty)
        .filter(e => e._4 <= t).sortBy(e => (e._4, e._1))
      pid -> past.lastOption.map(_._3)
    }.toMap
    val df = Events.q69PitJoin(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"PIT join lost its user_id equi key:\n$plan")
    val got = df.collect()
      .map(r => r.getAs[Long]("purchase_id") ->
        Option(r.getAs[String]("status"))).toMap
    assert(got == expect, "PIT statuses diverge from the as-of replay")
    assert(got.values.exists(_.isEmpty) || expect.values.forall(_.nonEmpty),
      "left-join nulls should match the replay")
  }

  test("g14 labels match an in-memory weighted-majority replay") {
    // rebuild the support->=2 weighted graph in memory and run two
    // synchronous majority rounds (argmax weight, ties to min label)
    val items = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairs = items.groupBy(_._1).values.toList.flatMap { grp =>
      val ps = grp.map(_._2).distinct.sorted
      (for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))).toList
    }
    val wEdges = pairs.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 2).toList
      .flatMap { case ((a, b), w) => List((a, b, w), (b, a, w)) }
    var lab: Map[Long, Long] = wEdges.map(_._1).distinct.map(x => x -> x).toMap
    (1 to 2).foreach { _ =>
      val cur = lab
      lab = wEdges.groupBy(_._1).view.mapValues { es =>
        es.groupBy(e => cur(e._2)).view.mapValues(_.map(_._3).sum)
          .toList.minBy { case (l, w) => (-w, l) }._1
      }.toMap
    }
    val got = Events.queries("g14_label_prop")(spark, sf).collect()
      .map(r => r.getAs[Long]("p_partkey") -> r.getAs[Long]("community")).toMap
    assert(got == lab, s"LPA labels diverge from replay (${got.size} nodes)")
    // the point of LPA next to components: MULTIPLE communities even
    // where the graph is one connected blob
    assert(lab.values.toSet.size > 1, "degenerate: one community")
  }

  test("g16 link prediction: cap unhit at test SF, predictions are non-edges") {
    def rows(cap: Int) = Events.g16CommonNeighbors(spark, sf, cap = cap)
      .collect()
      .map(r => (r.getAs[Long]("part_a"), r.getAs[Long]("part_b"),
        r.getAs[Long]("common"))).toSeq
    val got = rows(512)
    assert(got.nonEmpty, "no link predictions at test SF")
    // d2's cap argument restated: the hub stop-list drops nothing here
    assert(got == rows(Int.MaxValue - 1),
      "adjacency cap dropped wedges at test SF")
    // predicted links must not already exist; verify against an
    // in-memory rebuild of the support>=2 edge set
    val items = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = items.groupBy(_._1).values.toList.flatMap { grp =>
      val ps = grp.map(_._2).distinct.sorted
      (for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))).toList
    }.groupBy(identity).filter(_._2.size >= 2).keySet
    got.foreach { case (a, b, c) =>
      assert(!edges((a, b)), s"predicted pair ($a,$b) is already an edge")
      assert(c >= 2)
    }
  }

  test("g10 per-node counts equal an in-memory brute triangle count") {
    val got = Events.g10TriangleCount(spark, sf).collect()
      .map(r => r.getAs[Long]("p_partkey") -> r.getAs[Long]("n_triangles"))
      .toMap
    // brute replay: adjacency sets + neighbor intersection per edge
    val items = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = items.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.toSet
    val adj = (edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) })
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val triCount = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    edges.foreach { case (a, b) =>
      // common neighbors c > b: each triangle counted once at a<b<c
      (adj(a) intersect adj(b)).filter(_ > b).foreach { c =>
        triCount(a) += 1; triCount(b) += 1; triCount(c) += 1
      }
    }
    assert(got == triCount.toMap, "per-node triangle counts diverge")
    assert(got.values.sum % 3 == 0, "total node-participations not 3·T")
    assert(got.values.sum > 0, "test graph has no triangles — vacuous")
  }

  test("q53 trailing range window equals an in-memory replay") {
    val got = Events.q53TimeRangeWindow(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("n_1h"), r.getAs[Long]("v_1h"))).toMap
    val evs = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000000000").as("ts_s"),
        expr("cast(floor(value * 1000) as bigint)").as("vq"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    evs.groupBy(_._2).values.foreach { grp =>
      grp.foreach { case (eid, _, ts, _) =>
        // RANGE frame: every row of the user within [ts-3599, ts],
        // INCLUDING same-second peers that sort after this row
        val in = grp.filter(e => e._3 >= ts - 3599 && e._3 <= ts)
        assert(got(eid) == (in.length.toLong, in.map(_._4).sum),
          s"event $eid window mismatch")
      }
    }
  }

  test("q54 JSON docs parse back losslessly and are canonical") {
    val rows = Events.q54BuildJson(spark, sf).collect()
    val exact = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    rows.foreach { r =>
      val uid = r.getAs[Long]("user_id")
      val doc = r.getAs[String]("doc")
      // canonical: compact separators, deterministic key and array order
      assert(!doc.contains(": ") && !doc.contains(", "), s"non-compact: $doc")
      val mine = exact.filter(_._1 == uid)
      val types = mine.map(_._2).distinct.sorted
      assert(doc ==
        s"""{"user_id":$uid,"n":${mine.length},"types":[${types.map("\"" + _ + "\"").mkString(",")}]}""",
        s"doc for user $uid diverges from hand-built JSON")
    }
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

  test("g15 sparsification cap is unhit at test SF: capped == uncapped") {
    // the scale control (top-cap strongest partners per node) must be
    // a provable NO-OP at oracle SFs — otherwise the DuckDB oracle,
    // which models the uncapped graph, would diverge
    // row-SET equality (r18: g15 no longer presentation-sorts)
    val capped = Events.g15LinkPredict(spark, sf).collect()
      .map(_.toString).sorted
    val uncapped = Events.g15LinkPredict(spark, sf, cap = Int.MaxValue)
      .collect().map(_.toString).sorted
    assert(capped.toSeq == uncapped.toSeq,
      "g15's default cap binds at test SF — oracle exactness broken")
    assert(capped.nonEmpty)
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
