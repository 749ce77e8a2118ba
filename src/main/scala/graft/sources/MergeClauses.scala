package graft.sources

import org.apache.spark.sql.Column

/** The clause surface of a multi-clause conditional MERGE (Delta's
  * full `MERGE INTO` grammar; the reference's approval flow —
  * `ApprovalEditData` app.py:5336, `approve-tag-equipment`
  * app.py:5706 — is exactly a conditional transition merge: only
  * PENDING rows may flip).
  *
  * Expression convention (Delta's alias convention, fixed): clause
  * conditions and value expressions reference TARGET columns as
  * `t.<col>` and SOURCE columns as `s.<col>` — e.g.
  * `expr("t.status = 'PENDING'")`, `Map("status" -> expr("s.status"))`.
  *   - matched clauses may reference both sides;
  *   - not-matched (insert) clauses may reference only `s.*`
  *     (there is no target row);
  *   - not-matched-by-source clauses may reference only `t.*`
  *     (there is no source row) — a stray `s.*` fails resolution
  *     loudly at the probe.
  * Within each group, clauses apply IN ORDER: the first clause whose
  * condition holds wins for that row; a row matching no clause
  * carries through unchanged (matched / by-source) or is dropped
  * (not-matched). `condition = None` means unconditional.
  */
object MergeClauses {

  /** `WHEN MATCHED [AND cond] THEN …` */
  sealed trait Matched { def condition: Option[Column] }

  /** `… THEN UPDATE SET <col> = <expr>, …` — columns absent from
    * `set` keep the target row's value.
    */
  final case class MatchedUpdate(condition: Option[Column],
                                 set: Map[String, Column]) extends Matched

  /** `… THEN DELETE` */
  final case class MatchedDelete(condition: Option[Column]) extends Matched

  /** `WHEN NOT MATCHED [AND cond] THEN INSERT (<col>, …) VALUES …` —
    * target columns absent from `values` insert NULL (Delta's rule).
    */
  final case class NotMatchedInsert(condition: Option[Column],
                                    values: Map[String, Column])

  /** `WHEN NOT MATCHED BY SOURCE [AND cond] THEN …` */
  sealed trait BySource { def condition: Option[Column] }

  final case class BySourceUpdate(condition: Option[Column],
                                  set: Map[String, Column]) extends BySource

  final case class BySourceDelete(condition: Option[Column]) extends BySource
}
