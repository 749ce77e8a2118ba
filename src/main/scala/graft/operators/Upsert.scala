package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Reusable MERGE on plain parquet DataFrames — the engine behind the
  * reference's Excel-upload upsert flow (`app.py:6063-6300`: read the
  * workbook, update matching registry keys, insert the rest). q29 is
  * the oracle-checked instance of this plan shape; this generalizes
  * it so any (base, updates) pair merges: a full-outer join on the
  * key, update columns winning where present.
  *
  * Conflict handling is per-column (the reference's real merge is
  * not last-write-wins everywhere: `merge_semicolon_values`,
  * `app.py:5911-5928`, UNIONS semicolon-delimited cell values when
  * both sides have one — a tag can belong to several P&IDs and the
  * upload must not drop the old memberships):
  *   - [[Upsert.UpdateWins]] (default): coalesce(update, base).
  *   - [[Upsert.DelimitedSetUnion]]: split both sides on the
  *     delimiter, union as a set, sort, re-join — deterministic
  *     regardless of which side listed a value first.
  *
  * Scale shape: one key-partitioned shuffle on each side (or zero if
  * both are bucketed on the key — see Readers.writeBucketed); updates
  * are usually tiny and broadcast automatically under AQE. The set
  * union is a per-row expression — no extra shuffle.
  */
object Upsert {

  sealed trait MergeStrategy
  /** Update value wins on matched keys; null update fields keep base. */
  case object UpdateWins extends MergeStrategy
  /** Union of delimiter-separated sets when both sides are present
    * (sorted for determinism); coalesce otherwise.
    */
  final case class DelimitedSetUnion(delim: String = ";") extends MergeStrategy

  /** Merge `updates` into `base` by `key`. Columns present in both
    * resolve via their strategy (default [[UpdateWins]]). Columns only
    * in base keep their value (null for inserted rows). Update-only
    * columns are ignored.
    */
  def merge(base: DataFrame, updates: DataFrame, key: String,
            strategies: Map[String, MergeStrategy] = Map.empty): DataFrame = {
    val updCols = updates.columns.toSet
    val u = updates.columns.foldLeft(updates) { (df, c) =>
      df.withColumnRenamed(c, s"__u_$c")
    }
    val joined = base.join(u, base(key) === u(s"__u_$key"), "full_outer")
    def resolve(c: String): Column =
      strategies.getOrElse(c, UpdateWins) match {
        case UpdateWins => coalesce(u(s"__u_$c"), base(c))
        case DelimitedSetUnion(d) =>
          val both = array_join(
            array_sort(array_distinct(concat(
              split(u(s"__u_$c"), java.util.regex.Pattern.quote(d)),
              split(base(c), java.util.regex.Pattern.quote(d))))), d)
          when(u(s"__u_$c").isNotNull && base(c).isNotNull, both)
            .otherwise(coalesce(u(s"__u_$c"), base(c)))
      }
    val out = base.columns.map { c =>
      if (c == key) coalesce(base(key), u(s"__u_$key")).as(key)
      else if (updCols.contains(c)) resolve(c).as(c)
      else base(c).as(c)
    }
    joined.select(out.toIndexedSeq: _*)
  }

  // q44: the reference's semicolon-set merge as an oracled query.
  // Base and update registries are derived in-query from `orders`
  // (deterministic, no synthesized data): matched keys union their
  // flag sets, base-only keys keep theirs, update-only keys insert.
  def q44MergeSemicolon(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val base = orders.filter(pmod(col("o_orderkey"), lit(4)) === 0)
      .select(col("o_orderkey"),
        concat_ws(";", col("o_orderstatus"), col("o_orderpriority")).as("flags"),
        col("o_totalprice"))
    val updates = orders
      .filter(pmod(col("o_orderkey"), lit(8)) === 0 ||
              pmod(col("o_orderkey"), lit(4)) === 1)
      .select(col("o_orderkey"),
        concat_ws(";", col("o_orderpriority"),
          concat(lit("C"), pmod(col("o_custkey"), lit(10)))).as("flags"))
    merge(base, updates, "o_orderkey", Map("flags" -> DelimitedSetUnion(";")))
      .orderBy("o_orderkey")
  }

  /** Apply a DELETE batch to a registry — the reference's delete
    * endpoints (`DeleteData` app.py:5216, `delete-tag` app.py:5638,
    * `ContributorDelete` app.py:4959) as a single auditable pass: every
    * base row keeps flowing, tagged `kept` (valid_to NULL) or `deleted`
    * (valid_to = `closeAsOf`, the SCD2 close) — so the caller gets BOTH
    * the post-delete registry (filter action='kept') and the audit
    * trail the reference writes to its history table, from one plan.
    * Scale shape: the delete key set is an endpoint batch — always
    * tiny next to the registry — so it broadcasts and the pass is
    * MAP-ONLY: the base never shuffles, deleting a handful of keys
    * from a 100 TB registry costs one scan. (An un-broadcast delete
    * set would still be a key-partitioned hash join, never a
    * cartesian.)
    */
  def applyDeletes(base: DataFrame, deletes: DataFrame, key: String,
                   closeAsOf: Column): DataFrame = {
    val dk = deletes.select(col(key)).distinct()
      .withColumn("__deleted", lit(1))
    base.join(broadcast(dk), Seq(key), "left")
      .withColumn("action",
        when(col("__deleted").isNotNull, "deleted").otherwise("kept"))
      .withColumn("valid_to",
        when(col("__deleted").isNotNull, closeAsOf.cast("date")))
      .drop("__deleted")
  }

  // q66: the oracled apply-deletes instance — the registry is q7's
  // "current row per key" view (latest order per custkey) and the
  // delete batch is a contributor-delete key set derived from
  // `customer` (every custkey ≡ 3 mod 7). The oracle replays the same
  // classification in SQL; ApplyDeletesSpec additionally proves the
  // IVM-style guarantee delete ≡ rebuild-without-those-keys and that
  // kept rows pass through bit-identical.
  def q66ApplyDeletes(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val registry = Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("last_date"))
    val dels = Tables.customer(s, d)
      .filter(pmod(col("c_custkey"), lit(7)) === 3)
      .select(col("c_custkey").as("o_custkey"))
    applyDeletes(registry, dels, "o_custkey", lit("1998-12-31"))
      .orderBy("o_custkey")
  }

  /** Generic snapshot diff: full-outer join two registry versions on
    * `key` and classify every key as added / removed / changed
    * (unchanged keys are dropped — at scale the diff is tiny next to
    * the snapshots). `compare` lists the payload columns; "changed"
    * means any of them differs (null-safe). ONE key-partitioned
    * exchange per side — or zero when both snapshots are bucketed on
    * the key (Readers.writeBucketed), the incremental-maintenance
    * fast path.
    */
  def snapshotDiff(a: DataFrame, b: DataFrame, key: String,
                   compare: Seq[String]): DataFrame = {
    val bb = b.columns.foldLeft(b)((df, c) => df.withColumnRenamed(c, s"__b_$c"))
    val changed = compare.map(c => !(a(c) <=> bb(s"__b_$c")))
      .reduce(_ || _)
    a.join(bb, a(key) === bb(s"__b_$key"), "full_outer")
      .withColumn("status",
        when(a(key).isNull, "added")
          .when(bb(s"__b_$key").isNull, "removed")
          .when(changed, "changed"))
      .filter(col("status").isNotNull)
      .select(Seq(coalesce(a(key), bb(s"__b_$key")).as(key), col("status")) ++
        compare.flatMap(c =>
          Seq(a(c).as(s"old_$c"), bb(s"__b_$c").as(s"new_$c"))): _*)
  }

  // q51: the oracled snapshot-diff instance — the reference's
  // scheduled-sync question ("what changed since the last extract",
  // sync_tags at app.py:6631-6753) answered by STATE COMPARISON
  // instead of modified-date columns (q49's shape), which is the only
  // correct path when upstream lacks reliable change timestamps.
  // Snapshots are derived deterministically from `orders`: B drops
  // every 97th key (removed), re-prices every 13th (changed), and A
  // lacks every 89th (so B shows them as added).
  def q51SnapshotDiff(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val snapA = o.filter(pmod(col("o_orderkey"), lit(89)) =!= 0)
    val snapB = o.filter(pmod(col("o_orderkey"), lit(97)) =!= 0)
      .withColumn("o_totalprice",
        when(pmod(col("o_orderkey"), lit(13)) === 0,
          col("o_totalprice") * 2).otherwise(col("o_totalprice")))
    snapshotDiff(snapA, snapB, "o_orderkey",
        Seq("o_orderstatus", "o_totalprice"))
      .orderBy("o_orderkey")
  }

  /** Conditional status-transition MERGE — the reference's
    * contributor-approval flow (`app.py:5706` approve-tag-equipment,
    * `app.py:4859` ContributorApprovalData, `app.py:4962` the
    * reject-updates-instead-of-deleting rule) as one registry pass:
    * an admin decision batch lands on a registry whose rows carry an
    * `approval_status` lifecycle, and ONLY rows currently PENDING may
    * transition (the reference's GetApprovalTag reads PENDING rows
    * exclusively so settled tags never re-enter the queue —
    * `app.py:4936`). Per row:
    *   - PENDING + approve  → APPROVED, stamped (admin, approved_date)
    *   - PENDING + reject   → REJECTED, stamped + rejection_comment
    *   - settled + decision → payload untouched, outcome
    *     'illegal_transition' (audit row; the reference returns the
    *     conflict to the caller instead of clobbering)
    *   - no decision        → 'unchanged', bit-identical passthrough
    *   - decision on absent key → synthetic 'missing_key' audit row
    * Scale shape: decisions are an admin batch — tiny, ALWAYS
    * broadcast — so the transition pass is a zero-shuffle broadcast
    * join over one registry scan, and the missing-key audit is a
    * second KEY-COLUMN-ONLY scan inner-broadcast-joined to the batch
    * (tiny output) anti-joined in memory scale. No wide exchange ever
    * carries the registry; at 100 TB the op costs ~1 column-pruned
    * scan + 1 full scan, both shuffle-free.
    */
  def applyApprovals(base: DataFrame, decisions: DataFrame, key: String,
                     asOf: Column): DataFrame = {
    val dec = decisions.select(col(key), col("decision").as("__d_decision"),
      col("admin").as("__d_admin"), col("comment").as("__d_comment"))
    val applied = base.join(broadcast(dec), Seq(key), "left")
      .withColumn("outcome",
        when(col("__d_decision").isNull, "unchanged")
          .when(col("approval_status") =!= "PENDING", "illegal_transition")
          .when(col("__d_decision") === "approve", "approved")
          .otherwise("rejected"))
      .withColumn("new_status",
        when(col("outcome") === "approved", "APPROVED")
          .when(col("outcome") === "rejected", "REJECTED")
          .otherwise(col("approval_status")))
      .withColumn("admin",
        when(col("outcome").isin("approved", "rejected"), col("__d_admin")))
      .withColumn("rejection_comment",
        when(col("outcome") === "rejected", col("__d_comment")))
      .withColumn("approved_date",
        when(col("outcome").isin("approved", "rejected"), asOf.cast("date")))
      .withColumnRenamed("approval_status", "old_status")
      .drop("__d_decision", "__d_admin", "__d_comment")
    // decisions whose key is absent from the registry: matched keys
    // come from a key-only registry scan broadcast-joined to the
    // batch (output ≤ batch size), so the anti join is batch × batch
    val matched = base.select(col(key))
      .join(broadcast(dec.select(col(key))), Seq(key))
    val missing = dec.join(matched, Seq(key), "left_anti")
      .select(Seq(col(key), lit("missing_key").as("outcome")) ++
        applied.columns.filterNot(c => c == key || c == "outcome").map(c =>
          lit(null).cast(applied.schema(c).dataType).as(c)): _*)
    applied.unionByName(missing)
  }

  // q73: the oracled approval-flow instance. The registry derives
  // from `orders` (o_orderstatus O/F/P → PENDING/APPROVED/REJECTED —
  // the open orders are the approval queue); the admin batch decides
  // every key ≡ 1 mod 5 (approve) or ≡ 2 mod 5 (reject), and keys ≡
  // 0 mod 101 are NEGATED so they miss the registry and exercise the
  // missing-key audit path. Settled rows hit by a decision surface as
  // illegal_transition with their payload untouched;
  // ApprovalFlowSpec additionally proves transition ≡ rebuild and
  // byte-identical passthrough of undecided rows.
  def q73ApprovalFlow(s: SparkSession, d: String): DataFrame = {
    val reg = Tables.orders(s, d).select(
      col("o_orderkey").as("tag_id"),
      concat(lit("user"), pmod(col("o_custkey"), lit(50))).as("requested_by"),
      col("o_totalprice").as("total"),
      when(col("o_orderstatus") === "O", "PENDING")
        .when(col("o_orderstatus") === "F", "APPROVED")
        .otherwise("REJECTED").as("approval_status"))
    val dec = Tables.orders(s, d)
      .filter(pmod(col("o_orderkey"), lit(5)).isin(1, 2) ||
        pmod(col("o_orderkey"), lit(101)) === 0)
      .select(
        when(pmod(col("o_orderkey"), lit(101)) === 0, -col("o_orderkey"))
          .otherwise(col("o_orderkey")).as("tag_id"),
        when(pmod(col("o_orderkey"), lit(5)) === 1, "approve")
          .otherwise("reject").as("decision"),
        concat(lit("admin"), pmod(col("o_custkey"), lit(5))).as("admin"),
        concat(lit("rej-"), pmod(col("o_orderkey"), lit(7))).as("comment"))
    applyApprovals(reg, dec, "tag_id", lit("1998-12-31"))
      .orderBy("tag_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q44_merge_semicolon" -> (q44MergeSemicolon _),
    "q51_snapshot_diff" -> (q51SnapshotDiff _),
    "q66_apply_deletes" -> (q66ApplyDeletes _),
    "q73_approval_flow" -> (q73ApprovalFlow _),
  )

  val oracles: Map[String, String] = Map(
    "q73_approval_flow" ->
      """WITH reg AS (
        |  SELECT o_orderkey AS tag_id,
        |    'user' || CAST(o_custkey % 50 AS VARCHAR) AS requested_by,
        |    o_totalprice AS total,
        |    CASE o_orderstatus WHEN 'O' THEN 'PENDING'
        |      WHEN 'F' THEN 'APPROVED' ELSE 'REJECTED' END AS approval_status
        |  FROM orders),
        |dec AS (
        |  SELECT CASE WHEN o_orderkey % 101 = 0 THEN -o_orderkey
        |           ELSE o_orderkey END AS tag_id,
        |    CASE WHEN o_orderkey % 5 = 1 THEN 'approve' ELSE 'reject' END
        |      AS decision,
        |    'admin' || CAST(o_custkey % 5 AS VARCHAR) AS admin,
        |    'rej-' || CAST(o_orderkey % 7 AS VARCHAR) AS comment
        |  FROM orders WHERE o_orderkey % 5 IN (1, 2) OR o_orderkey % 101 = 0),
        |applied AS (
        |  SELECT r.tag_id, r.requested_by, r.total,
        |    r.approval_status AS old_status,
        |    CASE WHEN d.decision IS NULL THEN 'unchanged'
        |         WHEN r.approval_status <> 'PENDING' THEN 'illegal_transition'
        |         WHEN d.decision = 'approve' THEN 'approved'
        |         ELSE 'rejected' END AS outcome,
        |    d.decision, d.admin AS dadmin, d.comment AS dcomment
        |  FROM reg r LEFT JOIN dec d ON r.tag_id = d.tag_id)
        |SELECT tag_id, requested_by, total, old_status,
        |  CASE outcome WHEN 'approved' THEN 'APPROVED'
        |    WHEN 'rejected' THEN 'REJECTED' ELSE old_status END AS new_status,
        |  CASE WHEN outcome IN ('approved', 'rejected') THEN dadmin END
        |    AS admin,
        |  CASE WHEN outcome = 'rejected' THEN dcomment END
        |    AS rejection_comment,
        |  CASE WHEN outcome IN ('approved', 'rejected')
        |    THEN DATE '1998-12-31' END AS approved_date,
        |  outcome
        |FROM applied
        |UNION ALL
        |SELECT d.tag_id, CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE),
        |  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
        |  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
        |  CAST(NULL AS DATE), 'missing_key'
        |FROM dec d LEFT JOIN reg r ON d.tag_id = r.tag_id
        |WHERE r.tag_id IS NULL
        |ORDER BY tag_id""".stripMargin,
    "q66_apply_deletes" ->
      """WITH reg AS (
        |  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS last_date
        |  FROM (SELECT o_custkey, o_orderkey, o_orderdate,
        |      ROW_NUMBER() OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |    FROM orders) WHERE rn = 1),
        |d AS (SELECT DISTINCT c_custkey FROM customer WHERE c_custkey % 7 = 3)
        |SELECT r.o_custkey, r.o_orderkey, r.last_date,
        |  CASE WHEN d.c_custkey IS NOT NULL THEN 'deleted' ELSE 'kept' END
        |    AS action,
        |  CASE WHEN d.c_custkey IS NOT NULL THEN DATE '1998-12-31' END
        |    AS valid_to
        |FROM reg r LEFT JOIN d ON r.o_custkey = d.c_custkey
        |ORDER BY o_custkey""".stripMargin,
    "q44_merge_semicolon" ->
      """WITH base AS (
        |  SELECT o_orderkey,
        |    o_orderstatus || ';' || o_orderpriority AS flags, o_totalprice
        |  FROM orders WHERE o_orderkey % 4 = 0),
        |upd AS (
        |  SELECT o_orderkey,
        |    o_orderpriority || ';C' || CAST(o_custkey % 10 AS VARCHAR) AS flags
        |  FROM orders WHERE o_orderkey % 8 = 0 OR o_orderkey % 4 = 1)
        |SELECT COALESCE(b.o_orderkey, u.o_orderkey) AS o_orderkey,
        |  CASE WHEN b.flags IS NOT NULL AND u.flags IS NOT NULL THEN
        |    array_to_string(list_sort(list_distinct(list_concat(
        |      string_split(u.flags, ';'), string_split(b.flags, ';')))), ';')
        |  ELSE COALESCE(u.flags, b.flags) END AS flags,
        |  b.o_totalprice AS o_totalprice
        |FROM base b FULL OUTER JOIN upd u ON b.o_orderkey = u.o_orderkey
        |ORDER BY o_orderkey""".stripMargin,
    "q51_snapshot_diff" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |a AS (SELECT * FROM o WHERE o_orderkey % 89 <> 0),
        |b AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice * 2
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM o WHERE o_orderkey % 97 <> 0)
        |SELECT * FROM (
        |  SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
        |    CASE WHEN a.o_orderkey IS NULL THEN 'added'
        |         WHEN b.o_orderkey IS NULL THEN 'removed'
        |         WHEN a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
        |           OR a.o_totalprice IS DISTINCT FROM b.o_totalprice
        |           THEN 'changed' END AS status,
        |    a.o_orderstatus AS old_o_orderstatus,
        |    b.o_orderstatus AS new_o_orderstatus,
        |    a.o_totalprice AS old_o_totalprice,
        |    b.o_totalprice AS new_o_totalprice
        |  FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey) t
        |WHERE status IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin,
  )
}
