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
  */
class DelegatingScanBuilder(under: ScanBuilder, wrap: Scan => Scan)
    extends ScanBuilder
    with SupportsPushDownCatalystFilters
    with SupportsPushDownRequiredColumns {

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] =
    under match {
      case s: SupportsPushDownCatalystFilters => s.pushFilters(filters)
      case _ => filters
    }

  override def pushedFilters: Array[Predicate] = under match {
    case s: SupportsPushDownCatalystFilters => s.pushedFilters
    case _ => Array.empty
  }

  override def pruneColumns(requiredSchema: StructType): Unit = under match {
    case s: SupportsPushDownRequiredColumns => s.pruneColumns(requiredSchema)
    case _ => ()
  }

  override def build(): Scan = wrap(under.build())
}
