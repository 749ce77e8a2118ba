package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, EqualNullSafe, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project, Sort, Window}

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

  /** Time columns: an aggregate grouped purely on (buckets of) these
    * yields calendar-cardinality rows — months, days, hours of the
    * data's time span — safe even under a GLOBAL window (q28's
    * monthly lag). Grouping on anything else (user_id, a text hash)
    * scales with the corpus and gets no global-window exception.
    */
  val boundedDomain: Set[String] = Set(
    "o_orderdate", "l_shipdate", "ts_us", "ts_s", "month", "day", "hour")

  /** A join with no equality predicate at all — empty condition OR a
    * pure theta condition (range/inequality only) — evaluates |L|·|R|
    * pairs through a nested loop; both shapes need an explicit
    * broadcast hint to pass (a hinted one is a deliberate
    * broadcast-nested-loop over a small side).
    */
  def unhintedCartesians(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case j: Join if j.hint.leftHint.isEmpty && j.hint.rightHint.isEmpty &&
          !j.condition.exists(_.exists {
            case _: EqualTo | _: EqualNullSafe => true
            case _ => false
          }) =>
        j.simpleStringWithNodeId()
    }

  /** The aggregate feeding a window, looking only through row-
    * preserving nodes — an Aggregate below a join/explode says nothing
    * about the window's input cardinality.
    */
  private def inputAggregate(p: LogicalPlan): Option[Aggregate] = p match {
    case a: Aggregate => Some(a)
    case pr: Project => inputAggregate(pr.child)
    case f: Filter => inputAggregate(f.child)
    case s: Sort => inputAggregate(s.child)
    case w: Window => inputAggregate(w.child)
    case _ => None
  }

  /** The base columns an aggregate groups on, resolved one alias level
    * through its child Project — the optimizer's
    * PullOutGroupingExpressions extracts complex grouping expressions
    * (q28's date_trunc) into a `_groupingexpression` alias below the
    * Aggregate, which would otherwise hide the calendar column.
    */
  private def groupingBaseRefs(a: Aggregate): Set[String] = {
    val aliasMap: Map[String, Set[String]] = a.child match {
      case pr: Project => pr.projectList.collect {
        case al: Alias => al.name -> al.child.references.toSeq.map(_.name).toSet
      }.toMap
      case _ => Map.empty
    }
    a.groupingExpressions.flatMap(_.references.toSeq.map(_.name)).toSet
      .flatMap((n: String) => aliasMap.getOrElse(n, Set(n)))
  }

  def unboundedWindows(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case w: Window =>
        val parts = w.partitionSpec.flatMap(_.references.toSeq.map(_.name)).distinct
        val lowCardOnly = parts.isEmpty || parts.forall(lowCardinality)
        // bounded if the window's DIRECT input is an aggregate grouped
        // strictly finer than (and containing) the partition key —
        // rows-per-partition = the extra group columns' domain, not
        // the corpus. A GLOBAL window is allowed only over an
        // aggregate grouped purely on calendar columns (q28's monthly
        // lag): a per-user aggregate under a global window is still
        // corpus-cardinality in one task.
        lazy val boundedByAgg =
          inputAggregate(w.child).exists { a =>
            val groupRefs = groupingBaseRefs(a)
            if (parts.isEmpty)
              groupRefs.nonEmpty && groupRefs.subsetOf(boundedDomain)
            else
              a.groupingExpressions.size > w.partitionSpec.size &&
                parts.toSet.subsetOf(groupRefs)
          }
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
    // flag the RAW text attribute as a key — not any expression that
    // merely reads text: groupBy(xxhash64(text)) is the BLESSED
    // pattern (the exchange carries the 8-byte hash, text is consumed
    // map-side before the shuffle) and must not trip the rule
    def isTextAttr(e: Expression) = e match {
      case a: AttributeReference => a.name == "text"
      case _ => false
    }
    df.queryExecution.optimizedPlan.collect {
      case a: Aggregate if a.groupingExpressions.exists(isTextAttr) =>
        "aggregate grouped on text"
      case w: Window if w.partitionSpec.exists(isTextAttr) =>
        "window partitioned on text"
      case j: Join if j.condition.exists(_.exists {
          case EqualTo(l, r) => isTextAttr(l) || isTextAttr(r)
          case EqualNullSafe(l, r) => isTextAttr(l) || isTextAttr(r)
          case _ => false
        }) =>
        "join keyed on text"
      case s: Sort if s.global && s.order.exists(o => isTextAttr(o.child)) =>
        "global sort on text"
    }
  }

  def violations(df: DataFrame): Seq[String] =
    unhintedCartesians(df).map("cartesian: " + _) ++
      unboundedWindows(df).map("unbounded " + _) ++
      textKeyedShuffles(df).map("text-keyed shuffle: " + _)
}
