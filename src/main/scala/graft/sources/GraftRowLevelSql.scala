package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** SQL `UPDATE` and `MERGE INTO` on graft tables (the reference's
  * hottest write endpoints — `SaveData` app.py:5253 field edits,
  * `uploadExcel` app.py:6063 bulk upserts — in their SQL form), the
  * missing half of the SQL DML surface next to `DELETE FROM` /
  * `TRUNCATE` (SupportsDelete on [[GraftDataSource]]).
  *
  * Spark has no stable public hook for row-level SQL against a
  * custom log-managed format (SupportsRowLevelOperations hands the
  * engine a group-replace plan that would write parquet BEHIND the
  * commit log), so — like Delta — the statements are claimed during
  * ANALYSIS: an extensions-injected resolution rule matches a fully
  * resolved `UpdateTable` / `MergeIntoTable` whose target is a graft
  * snapshot ([[GraftSnapshotTable]] names the root) and replaces it
  * with a lazily-run command that routes into the SAME atomic verbs
  * the API uses — [[GraftTable.update]]'s stats-pruned copy-on-write
  * rewrite and [[GraftTable.merge]]'s key-pruned upsert. One commit,
  * CDF images, conflict detection: identical semantics to the verb,
  * because it IS the verb.
  *
  * TRANSLATABILITY is checked up front and refused loudly (the
  * engine must error rather than run a different statement than the
  * user wrote):
  *   - UPDATE: any SET columns / predicate the verb accepts
  *     (expressions evaluate against the OLD row, SQL semantics);
  *   - MERGE: the upsert shape — single equi-key ON, unconditional
  *     `WHEN MATCHED THEN UPDATE SET` whose assignments all copy the
  *     same-named source column, optional unconditional
  *     `WHEN NOT MATCHED THEN INSERT` of every column (absent ⇒ the
  *     source is pre-filtered to matched keys, update-only);
  *   - refused: conditional clauses, `WHEN MATCHED THEN DELETE`
  *     (use `DELETE FROM`), `WHEN NOT MATCHED BY SOURCE`, non-equi
  *     or multi-key ON, cross-column assignments.
  */
class GraftRowLevelSql(spark: SparkSession) extends Rule[LogicalPlan] {

  private val shim = org.apache.spark.sql.graft.shim

  private def graftPath(plan: LogicalPlan): Option[String] = plan match {
    case SubqueryAlias(_, child) => graftPath(child)
    case r: DataSourceV2Relation => r.table match {
      case g: GraftSnapshotTable => Some(g.tablePath)
      case _ => None
    }
    case _ => None
  }

  /** Resolved attribute refs back to plain names: the verb applies
    * the expressions to a FRESH read of the table, where this plan's
    * exprIds mean nothing.
    */
  private def nameBased(e: Expression): Expression = e.transform {
    case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
  }

  private def colOf(e: Expression) = shim.column(nameBased(e))

  private def refuse(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft SQL DML cannot translate this statement: $what")

  private def attrName(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case UnresolvedAttribute(parts) => Some(parts.last)
    case Alias(c, _) => attrName(c)
    case Cast(c, _, _, _) => attrName(c)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case u @ UpdateTable(target, assignments, condition)
        if u.childrenResolved && graftPath(target).isDefined &&
          assignments.forall(_.resolved) && condition.forall(_.resolved) =>
      val path = graftPath(target).get
      val set = assignments.map { a =>
        val name = attrName(a.key).getOrElse(refuse(
          s"UPDATE SET target must be a plain column, got ${a.key.sql}"))
        name -> colOf(a.value)
      }.toMap
      val pred = condition.map(colOf)
        .getOrElse(org.apache.spark.sql.functions.lit(true))
      GraftSqlDmlCommand(s"graft UPDATE $path", { s =>
        GraftTable.forPath(s, path).update(pred, set); ()
      })

    case m: MergeIntoTable
        if m.childrenResolved && graftPath(m.targetTable).isDefined &&
          m.mergeCondition.resolved &&
          (m.matchedActions ++ m.notMatchedActions ++
            m.notMatchedBySourceActions).forall {
              case UpdateAction(c, as, _) =>
                c.forall(_.resolved) && as.forall(_.resolved)
              case InsertAction(c, as) =>
                c.forall(_.resolved) && as.forall(_.resolved)
              case DeleteAction(c) => c.forall(_.resolved)
              case _ => false // *-actions still unexpanded: wait
            } =>
      val path = graftPath(m.targetTable).get
      val targetAttrs = m.targetTable.outputSet
      val targetCols = m.targetTable.output.map(_.name)

      // ON must be a single equi-key between same-named columns
      val key = m.mergeCondition match {
        case EqualTo(l, r) =>
          (attrName(l), attrName(r)) match {
            case (Some(a), Some(b)) if a.equalsIgnoreCase(b) => a
            case _ => refuse(s"MERGE ON must equate one same-named " +
              s"column of target and source, got ${m.mergeCondition.sql}")
          }
        case other => refuse("MERGE ON must be a single equality, got " +
          other.sql)
      }

      // an assignment is a plain same-named copy from the SOURCE side
      def strip(e: Expression): Expression = e match {
        case Alias(c, _) => strip(c)
        case Cast(c, _, _, _) => strip(c)
        case other => other
      }
      def isCopy(a: Assignment): Boolean = strip(a.value) match {
        case ar: AttributeReference =>
          attrName(a.key).exists(_.equalsIgnoreCase(ar.name)) &&
            !targetAttrs.contains(ar)
        case _ => false
      }

      if (m.notMatchedBySourceActions.nonEmpty)
        refuse("WHEN NOT MATCHED BY SOURCE is not supported")
      m.matchedActions match {
        case Seq(UpdateAction(None, as, _)) =>
          val bad = as.filterNot(isCopy)
          if (bad.nonEmpty) refuse("WHEN MATCHED UPDATE assignments " +
            "must copy the same-named source column (the upsert " +
            s"shape); got ${bad.map(_.sql).mkString(", ")}")
        case Seq(UpdateAction(Some(c), _, _)) =>
          refuse(s"conditional WHEN MATCHED AND ${c.sql} — the verb " +
            "has no per-clause conditions")
        case Seq(DeleteAction(_)) =>
          refuse("WHEN MATCHED THEN DELETE — use DELETE FROM " +
            "(SupportsDelete) for key-scoped deletes")
        case other => refuse(s"exactly one unconditional WHEN MATCHED " +
          s"THEN UPDATE is required, got ${other.size} matched clauses")
      }
      val insert = m.notMatchedActions match {
        case Seq() => false
        case Seq(InsertAction(None, as)) =>
          val bad = as.filterNot(isCopy)
          if (bad.nonEmpty) refuse("WHEN NOT MATCHED INSERT must " +
            "insert every column from its same-named source column; " +
            s"got ${bad.map(_.sql).mkString(", ")}")
          val covered = as.flatMap(a => attrName(a.key))
            .map(_.toLowerCase).toSet
          val missing = targetCols.filterNot(c =>
            covered(c.toLowerCase))
          if (missing.nonEmpty) refuse("WHEN NOT MATCHED INSERT must " +
            s"cover every target column; missing ${missing.mkString(",")}")
          true
        case Seq(InsertAction(Some(c), _)) =>
          refuse(s"conditional WHEN NOT MATCHED AND ${c.sql}")
        case other => refuse(s"at most one WHEN NOT MATCHED clause, " +
          s"got ${other.size}")
      }
      val source = m.sourceTable
      GraftSqlDmlCommand(s"graft MERGE $path", { s =>
        import org.apache.spark.sql.functions.col
        val src0 = shim.dataFrame(s, source)
          .select(targetCols.map(col).toIndexedSeq: _*)
        val t = GraftTable.forPath(s, path)
        val src =
          if (insert) src0
          // no INSERT clause: update-only — keep source keys that
          // already exist (one key-column scan of the target)
          else src0.join(t.read().select(col(key)).distinct(),
            Seq(key), "left_semi")
        t.merge(src, key); ()
      })

    case _ => plan
  }
}

/** The analyzed form of a graft SQL DML statement: a leaf command
  * Spark executes eagerly (like every Command) whose body runs the
  * table verb — one atomic commit, nothing written outside the log.
  */
case class GraftSqlDmlCommand(label: String, body: SparkSession => Unit)
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    body(session); Seq.empty
  }
  override def simpleString(maxFields: Int): String = label
}
