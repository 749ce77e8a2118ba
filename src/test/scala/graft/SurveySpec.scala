package graft

import scala.io.Source

/** Keeps SURVEY.md §2 honest: every checklist item marked done
  * ([x]/[~]) must exist in SparkEntry.queries, and [x] items must
  * have an oracle.
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
  }
}
