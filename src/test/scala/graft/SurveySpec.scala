package graft

import scala.io.Source

/** Keeps SURVEY.md §2 honest in BOTH directions: every checklist item
  * marked done ([x]/[~]) must exist in SparkEntry.queries, [x] items
  * must have an oracle, and every SparkEntry.queries key must have a
  * checklist entry — so the coverage contract can neither over- nor
  * under-state the implemented surface.
  */
class SurveySpec extends SparkSpec {
  test("SURVEY §2 statuses match the implemented surface") {
    val text = Source.fromFile("SURVEY.md", "UTF-8").mkString
    val item = """- \[([x~])\] `([a-z0-9_]+)`""".r
    val items = item.findAllMatchIn(text)
      .map(m => (m.group(2), m.group(1))).toList
    assert(items.nonEmpty, "no checklist items parsed from SURVEY.md")
    val qs = SparkEntry.queries.keySet
    val oracles = SparkEntry.oracleSql.keySet
    val missing = items.filter { case (n, _) => !qs.contains(n) }
    assert(missing.isEmpty, s"SURVEY claims done but not implemented: $missing")
    val unoracled = items.filter { case (n, st) => st == "x" && !oracles.contains(n) }
    assert(unoracled.isEmpty, s"SURVEY claims [x] but no oracle: $unoracled")
    val unlisted = qs -- items.map(_._1).toSet
    assert(unlisted.isEmpty,
      s"implemented but missing from SURVEY §2 (add checklist entries): $unlisted")
  }
}
