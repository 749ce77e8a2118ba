package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType

/** ScanBuilder wrapper that re-exposes the wrapped builder's pushdown
  * surface and lets `build()` wrap the produced Scan (the `graft`
  * DataSource uses it to graft `toMicroBatchStream` onto Spark's own
  * ParquetScan without losing batch pushdown). FileScanBuilder's
  * filter pushdown rides the `private[sql]`
  * SupportsPushDownCatalystFilters interface, hence this package-
  * located shim — same technique as the Column/Expression bridge.
  *
  * `reprune` is the LOG-LEVEL DATA SKIPPING hook: once Spark has
  * pushed the data filters, `build()` offers them back to the
  * DataSource, which may answer with a REPLACEMENT builder over the
  * stats-surviving file subset (resolved from the commit log's
  * add-action stats — no footer opened). The captured filters and
  * column pruning are replayed onto the replacement, so the pruned
  * scan keeps identical pushdown; `None` means no file could be
  * skipped and the original builder serves. Skipping is conservative
  * by construction (FileStats.mayMatch) and Spark re-applies the
  * post-scan filters regardless.
  */
class DelegatingScanBuilder(under: ScanBuilder, wrap: Scan => Scan,
                            reprune: Seq[Expression] => Option[ScanBuilder] =
                              _ => None)
    extends ScanBuilder
    with SupportsPushDownCatalystFilters
    with SupportsPushDownRequiredColumns {

  private var capturedFilters: Seq[Expression] = Nil
  private var capturedRequired: Option[StructType] = None

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    capturedFilters = filters
    under match {
      case s: SupportsPushDownCatalystFilters => s.pushFilters(filters)
      case _ => filters
    }
  }

  override def pushedFilters: Array[Predicate] = under match {
    case s: SupportsPushDownCatalystFilters => s.pushedFilters
    case _ => Array.empty
  }

  override def pruneColumns(requiredSchema: StructType): Unit = {
    capturedRequired = Some(requiredSchema)
    under match {
      case s: SupportsPushDownRequiredColumns => s.pruneColumns(requiredSchema)
      case _ => ()
    }
  }

  override def build(): Scan = {
    val effective =
      (if (capturedFilters.nonEmpty) reprune(capturedFilters) else None)
        .map { b =>
          b match {
            case s: SupportsPushDownCatalystFilters =>
              s.pushFilters(capturedFilters); ()
            case _ => ()
          }
          (b, capturedRequired) match {
            case (p: SupportsPushDownRequiredColumns, Some(r)) =>
              p.pruneColumns(r)
            case _ => ()
          }
          b
        }
        .getOrElse(under)
    wrap(effective.build())
  }
}
