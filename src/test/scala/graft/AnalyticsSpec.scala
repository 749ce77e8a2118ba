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
}
