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

  // ---- N-dimensional spreads (round 15): the standard 3-D (21 bits,
  // stride 3) and 4-D (16 bits, stride 4) magic-mask interleaves —
  // the same shift/mask closed forms as the 2-D spread, so an N-dim
  // z-value stays pure codegen'd column arithmetic (no UDF, no loop).

  private val Spread3Masks = Seq(
    32 -> 0x001f00000000ffffL,
    16 -> 0x001f0000ff0000ffL,
    8  -> 0x100f00f00f00f00fL,
    4  -> 0x10c30c30c30c30c3L,
    2  -> 0x1249249249249249L)

  /** Spread the low 21 bits into positions 0, 3, 6, … */
  private def spread3(c: Column): Column =
    Spread3Masks.foldLeft(c.bitwiseAND(lit(0x1fffffL))) {
      case (x, (s, m)) => x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }

  private val Spread4Masks = Seq(
    24 -> 0x000000ff000000ffL,
    12 -> 0x000f000f000f000fL,
    6  -> 0x0303030303030303L,
    3  -> 0x1111111111111111L)

  /** Spread the low 16 bits into positions 0, 4, 8, … */
  private def spread4(c: Column): Column =
    Spread4Masks.foldLeft(c.bitwiseAND(lit(0xffffL))) {
      case (x, (s, m)) => x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }

  /** The N-dimensional z-value (2 ≤ N ≤ 4): dim i's bits land at
    * positions i, i+N, i+2N, …. Per-dim bit budget shrinks with N
    * (31/21/16) — the usual Morton trade, and also why the refusal
    * stops at 4: past that, footer stats stop being selective on any
    * dimension and the layout buys nothing (Delta's own guidance).
    */
  def zvalN(dims: Seq[Column]): Column = {
    require(dims.size >= 2 && dims.size <= 4,
      s"ZORDER BY takes 2 to 4 dimensions, got ${dims.size} — past 4, " +
        "per-dimension bits (and footer-stat selectivity) collapse")
    dims.size match {
      case 2 => zval(dims(0), dims(1))
      case 3 => dims.zipWithIndex.map { case (c, i) =>
        shiftleft(spread3(c), i): Column }.reduce(_ bitwiseOR _)
      case _ => dims.zipWithIndex.map { case (c, i) =>
        shiftleft(spread4(c), i): Column }.reduce(_ bitwiseOR _)
    }
  }

  /** Per-dimension bit budget of the N-dim interleave. */
  private def bitsFor(n: Int): Int =
    n match { case 2 => 31; case 3 => 21; case _ => 16 }

  /** The z-value with every dimension RANGE-NORMALIZED into its bit
    * budget first (round 16 — a real 100 TB-scale bug): the spreads
    * mask to the low 31/21/16 bits, so a raw key past 2^31 (any real
    * lake's 64-bit ids) ALIASES — key mod 2^31 scrambles the
    * dimension's order and the layout silently stops clustering
    * (measured before the fix: the x100 probe read 16/16 files at
    * EVERY slice width while 1×/10× pruned fine, because the x100
    * keys live at replica·10⁹ ≫ 2³¹). One tiny agg over the frame
    * being rewritten finds each dim's [min, max]; the per-dim map
    * (v − lo) · scale is monotone, which is all Morton clustering
    * needs. Spans already inside the budget just shift by min — the
    * original behavior.
    *
    * Above 2^53 (round-17 pin): every dimension routes through
    * `double`, whose 53-bit mantissa QUANTIZES adjacent long keys —
    * neighboring 2^62-scale ids may land on the same normalized cell.
    * That is intentional and safe for everything this value feeds:
    * the map stays MONOTONE (doubles order like the longs they round
    * from), so neighbors stay neighbors, files keep tight disjoint
    * ranges, and stats pruning still works — the quantization only
    * coarsens WITHIN-cell order, never across-file order. Pruning
    * correctness never depends on the z-value at all (FileStats
    * re-checks real min/max); the spec pins clustering + pruning at
    * 2^62-scale keys.
    */
  def zvalNormalizedOver(df: DataFrame, dims: Seq[Column]): Column = {
    val cap = ((1L << bitsFor(dims.size)) - 1).toDouble
    val aggs = dims.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(c.cast("double")).as(s"__zlo$i"),
        max(c.cast("double")).as(s"__zhi$i"))
    }
    val r = df.agg(aggs.head, aggs.tail: _*).head
    val normed = dims.zipWithIndex.map { case (c, i) =>
      val lo = if (r.isNullAt(2 * i)) 0.0 else r.getDouble(2 * i)
      val hi = if (r.isNullAt(2 * i + 1)) 0.0 else r.getDouble(2 * i + 1)
      val span = hi - lo
      if (!(span > 0) || span.isInfinite) lit(0L) // constant/empty dim
      else if (span <= cap) (c.cast("double") - lit(lo)).cast("long")
      else ((c.cast("double") - lit(lo)) * lit(cap / span)).cast("long")
    }
    zvalN(normed)
  }

  /** Write `df` parquet z-ordered on (dimA, dimB) into ~numFiles
    * files: one range exchange on the z-value (sampled split points →
    * balanced files regardless of skew), an in-partition sort so
    * row-group stats are tight WITHIN each file too, and the helper
    * column dropped before bytes hit disk.
    */
  def writeZOrdered(df: DataFrame, dimA: Column, dimB: Column,
                    outDir: String, numFiles: Int): Unit =
    writeZOrdered(df, Seq(dimA, dimB), outDir, numFiles)

  /** The N-dimensional form (2 ≤ N ≤ 4 columns). */
  def writeZOrdered(df: DataFrame, dims: Seq[Column],
                    outDir: String, numFiles: Int): Unit =
    df.withColumn("__z", zvalNormalizedOver(df, dims))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
}
