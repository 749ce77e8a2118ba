package graft.sources

import org.apache.spark.sql.DataFrame
import scala.collection.mutable

/** Fuzzy workbook-header → registry-column mapping — the reference's
  * `map_excel_to_db_columns` + `normalize`
  * (`eni_uat_backend_code/app.py:5999-6021`, `app.py:5907`): uploaded
  * spreadsheets arrive with dressed-up headers ("Tag No.",
  * "Modified  Date (UTC)", typos) that must land on exact registry
  * columns before the MERGE.
  *
  * Resolution per header, in workbook column order, each target
  * usable at most once (the reference's `used` set):
  *   1. tag-number aliases — normalized tagno/lineno/cableno hit the
  *      designated key column;
  *   2. exact match on normalized forms;
  *   3. containment — the target's normalized form appears inside the
  *      header's (the reference's `re.search(norm_key, norm_excel)`);
  *   4. bounded edit distance for misspellings — NEW relative to the
  *      reference, which silently drops typo'd headers (and with them
  *      the column's data) on upload: the closest unused target by
  *      (distance, target order) wins when the distance is ≤ 1 for
  *      short names, ≤ 2 for normalized names of ≥ 6 chars.
  *
  * Normalization strips ALL non-alphanumerics, including underscores
  * — a deliberate divergence from the reference's `\W+` (which keeps
  * `_`, so "Tag No" can never exact-match "TAG_NO" there; its alias
  * list exists to paper over exactly that miss).
  *
  * Driver-side by design, like ExcelReader: a header row is dozens of
  * strings, so the edit-distance DP is plain Scala (q37 is the
  * distributed levenshtein twin); the distributed work is the MERGE
  * that follows (Upsert.merge).
  */
object HeaderMapper {

  /** Normalized key aliases the reference hardwires to the tag key. */
  private val KeyAliases = Set("tagno", "lineno", "cableno")

  def normalize(s: String): String =
    Option(s).getOrElse("").replaceAll("[^A-Za-z0-9]+", "").toLowerCase

  /** header → target column, for the headers that resolve. */
  def mapHeaders(headers: Seq[String], targets: Seq[String],
                 keyCol: Option[String] = None): Map[String, String] = {
    val normTargets = targets.map(t => (normalize(t), t))
    val used = mutable.Set.empty[String]
    val out = mutable.LinkedHashMap.empty[String, String]
    def free(t: String) = !used.contains(t)
    def take(h: String, t: String): Unit = { out(h) = t; used += t }
    headers.foreach { h =>
      val nh = normalize(h)
      lazy val exact = normTargets.find { case (nt, t) => nt == nh && free(t) }
      lazy val contained = normTargets.find { case (nt, t) =>
        nt.nonEmpty && nh.contains(nt) && free(t) }
      lazy val closest = normTargets.filter { case (_, t) => free(t) }
        .map { case (nt, t) => (editDistance(nh, nt), nt, t) }
        .sortBy { case (dist, _, t) => (dist, targets.indexOf(t)) }
        .headOption.filter { case (dist, nt, _) =>
          dist <= (if (nt.length >= 6) 2 else 1) }
      if (nh.nonEmpty) {
        keyCol.filter(k => KeyAliases.contains(nh) && targets.contains(k) && free(k)) match {
          case Some(k) => take(h, k)
          case None => (exact orElse contained orElse closest.map(c => (c._2, c._3)))
            .foreach { case (_, t) => take(h, t) }
        }
      }
    }
    out.toMap
  }

  /** Rename resolvable headers to their registry columns and drop the
    * rest — the upload frame this returns merges directly via
    * [[graft.operators.Upsert.merge]].
    */
  def remap(df: DataFrame, targets: Seq[String],
            keyCol: Option[String] = None): DataFrame = {
    val m = mapHeaders(df.columns.toSeq, targets, keyCol)
    val renamed = m.foldLeft(df) { case (acc, (h, t)) =>
      acc.withColumnRenamed(h, t)
    }
    renamed.select(m.values.toSeq.map(renamed.col): _*)
  }

  /** Plain Levenshtein, two-row DP — header-row-sized inputs only. */
  private def editDistance(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    var i = 1
    while (i <= a.length) {
      var prev = dp(0)
      dp(0) = i
      var j = 1
      while (j <= b.length) {
        val cur = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
        j += 1
      }
      i += 1
    }
    dp(b.length)
  }
}
