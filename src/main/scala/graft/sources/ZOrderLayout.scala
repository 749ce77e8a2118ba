package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout for multi-dimensional scan pruning —
  * the missing piece between a sorted write and a 100 TB ad-hoc scan:
  * a single-column sort clusters per-file min/max stats on ONE
  * dimension (every file spans the full range of every other column,
  * so a filter on those prunes nothing), while interleaving the bits
  * of two keys makes files cover compact RECTANGLES of the key space
  * — both dimensions' footer stats become selective at once. This is
  * the layout step a pretraining pipeline runs after d19/d23 so that
  * downstream (source, date-range) slices read a fraction of the
  * corpus; same idea as Delta/Iceberg OPTIMIZE ZORDER BY, built here
  * from plain expressions + a range-partitioned sorted write.
  *
  * Everything is codegen'd column arithmetic (shift/mask spreads, no
  * UDF) and the write is one range exchange on the z-value — the
  * exact cost of any global sort — so z-ordering is free relative to
  * a linear sort at any scale. ZOrderSpec proves the pruning claim
  * both ways: a day-slice prunes files under the (user, day) z-layout
  * but touches EVERY file of the user-sorted layout, and vice versa.
  */
object ZOrderLayout {

  private val SpreadMasks = Seq(
    16 -> 0x0000ffff0000ffffL,
    8  -> 0x00ff00ff00ff00ffL,
    4  -> 0x0f0f0f0f0f0f0f0fL,
    2  -> 0x3333333333333333L,
    1  -> 0x5555555555555555L)

  /** Spread the low 31 bits of a non-negative long into the even bit
    * positions (0, 2, 4, …) — the classic magic-mask Morton spread,
    * as closed-form column arithmetic.
    */
  private def spread(c: Column): Column =
    SpreadMasks.foldLeft(c.bitwiseAND(lit(0x7fffffffL))) {
      case (x, (s, m)) => x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }

  /** The z-value of two dimension keys: bits of `a` at even positions,
    * bits of `b` at odd. Domain: both masked to [0, 2^31) — callers
    * with wider or signed keys bucket/offset them first (rank or
    * modulo; only RELATIVE order within each dimension matters for
    * clustering). Monotone per dimension with the other fixed.
    */
  def zval(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** Write `df` parquet z-ordered on (dimA, dimB) into ~numFiles
    * files: one range exchange on the z-value (sampled split points →
    * balanced files regardless of skew), an in-partition sort so
    * row-group stats are tight WITHIN each file too, and the helper
    * column dropped before bytes hit disk.
    */
  def writeZOrdered(df: DataFrame, dimA: Column, dimB: Column,
                    outDir: String, numFiles: Int): Unit =
    df.withColumn("__z", zval(dimA, dimB))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
}
