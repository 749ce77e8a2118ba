package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, Sort, Window}

/** Hard plan invariants — the scale-killer shapes round-1 review
  * flagged, encoded as checks so a future operator that reintroduces
  * one turns a spec red (PlanInvariantsSpec) instead of surviving to
  * a 1000-executor cluster:
  *
  *  1. No cartesian join without an explicit broadcast hint. An
  *     unhinted cross join materializes |L|·|R| rows through a
  *     shuffle; a hinted one (e1's 10-row query set) is a deliberate
  *     broadcast-nested-loop.
  *  2. No window over an effectively-unbounded partition: a window
  *     whose partition key is empty (global) or drawn only from
  *     known low-cardinality columns funnels a constant fraction of
  *     the corpus through single tasks. Exception: the window's input
  *     is already an aggregate over a STRICTLY FINER grouping (q32's
  *     per-(flag, day) dailies under a per-flag window — partition
  *     size is bounded by the day domain, not the corpus).
  */
object PlanInvariants {

  /** Columns with a small, corpus-independent value domain. */
  val lowCardinality: Set[String] = Set(
    "o_orderstatus", "o_orderpriority", "l_returnflag", "l_linestatus",
    "event_type", "lang", "horiz", "kind", "quartile")

  def unhintedCartesians(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case j: Join if j.condition.isEmpty &&
          j.hint.leftHint.isEmpty && j.hint.rightHint.isEmpty =>
        j.simpleStringWithNodeId()
    }

  def unboundedWindows(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case w: Window =>
        val parts = w.partitionSpec.flatMap(_.references.toSeq.map(_.name)).distinct
        val lowCardOnly = parts.isEmpty || parts.forall(lowCardinality)
        // bounded if the window reads an aggregate grouped strictly
        // finer than the partition key (rows-per-partition = the extra
        // group columns' domain, not the corpus)
        lazy val boundedByAgg = w.child.collectFirst {
          case a: Aggregate
            if a.groupingExpressions.size > w.partitionSpec.size => a
        }.isDefined
        if (lowCardOnly && !boundedByAgg)
          Some(s"window partitioned by [${parts.mkString(",")}]")
        else None
    }.flatten

  /** 3. No shuffle KEYED on raw document text. Aggregate grouping,
    * window partitioning, join conditions, and global sorts are the
    * places a logical plan forces a hash/range exchange; a `text` key
    * moves the corpus' text bytes through that exchange (and hashes/
    * compares kilobyte keys). Dedup must key on xxhash64(text) and
    * resolve collisions inside the hash partition (d1/p1/p2 do; this
    * rule keeps it that way for every future operator).
    */
  def textKeyedShuffles(df: DataFrame): Seq[String] = {
    def onText(e: org.apache.spark.sql.catalyst.expressions.Expression) =
      e.references.exists(_.name == "text")
    df.queryExecution.optimizedPlan.collect {
      case a: Aggregate if a.groupingExpressions.exists(onText) =>
        "aggregate grouped on text"
      case w: Window if w.partitionSpec.exists(onText) =>
        "window partitioned on text"
      case j: Join if j.condition.exists(onText) =>
        "join keyed on text"
      case s: Sort if s.global && s.order.exists(onText) =>
        "global sort on text"
    }
  }

  def violations(df: DataFrame): Seq[String] =
    unhintedCartesians(df).map("cartesian: " + _) ++
      unboundedWindows(df).map("unbounded " + _) ++
      textKeyedShuffles(df).map("text-keyed shuffle: " + _)
}
