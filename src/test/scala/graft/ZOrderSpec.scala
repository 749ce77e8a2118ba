package graft

import graft.sources.ZOrderLayout
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  test("zval interleaves bits exactly (hand-computed cases)") {
    val rows = spark.range(1)
      .select(
        ZOrderLayout.zval(lit(0L), lit(0L)).as("z00"),
        ZOrderLayout.zval(lit(1L), lit(0L)).as("z10"),
        ZOrderLayout.zval(lit(0L), lit(1L)).as("z01"),
        ZOrderLayout.zval(lit(3L), lit(2L)).as("z32"),
        ZOrderLayout.zval(lit(0x7fffffffL), lit(0x7fffffffL)).as("zmax"))
      .collect().head
    assert(rows.getAs[Long]("z00") == 0L)
    assert(rows.getAs[Long]("z10") == 1L) // a occupies even bits
    assert(rows.getAs[Long]("z01") == 2L) // b occupies odd bits
    // a=0b11 -> 0b0101; b=0b10 -> 0b1000 (<<1): z = 0b1101 = 13
    assert(rows.getAs[Long]("z32") == 13L)
    // 31 bits each interleave into the low 62 bits, sign untouched
    assert(rows.getAs[Long]("zmax") == 0x3fffffffffffffffL)
    // monotone in each dimension with the other fixed
    val mono = spark.range(0, 1000)
      .select(ZOrderLayout.zval(col("id"), lit(77L)).as("z"), col("id"))
      .orderBy("id").collect().map(_.getAs[Long]("z"))
    assert(mono.sameElements(mono.sorted), "zval not monotone in dim a")
  }

  test("z-layout prunes file ranges on BOTH dims; linear sort on one") {
    val ev = Tables.events(spark, sf)
      .select((col("user_id") % 64).as("ux"),
        expr("ts div 86400000000000 % 64").as("day"))
    val n = 16
    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString
    val uDir = java.nio.file.Files.createTempDirectory("usort").toString
    ZOrderLayout.writeZOrdered(ev, col("ux"), col("day"), zDir, n)
    // the single-dimension baseline: same file count, sorted by ux
    ev.repartitionByRange(n, col("ux")).sortWithinPartitions("ux")
      .write.mode("overwrite").parquet(uDir)
    // per-file min/max — the same evidence parquet footer stats give
    // a scan planner
    def ranges(dir: String): Array[(Long, Long, Long, Long)] =
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg(min("ux"), max("ux"), min("day"), max("day"))
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val zr = ranges(zDir)
    val ur = ranges(uDir)
    // ux cardinality at sf0.001 (15 users) is below numFiles, so the
    // ux-range-partitioned baseline may produce < n non-empty files
    assert(zr.length == n && ur.length >= 10)
    // slices drawn from the OBSERVED key ranges (the tiny sf corpus
    // does not cover the full 64x64 domain)
    val uxAll = (zr.map(_._1).min, zr.map(_._2).max)
    val dayAll = (zr.map(_._3).min, zr.map(_._4).max)
    val uxSlice = (uxAll._1 + 2, uxAll._1 + 5)
    val daySlice = (dayAll._1 + 2, dayAll._1 + 5)
    def touches(rs: Array[(Long, Long, Long, Long)],
                ux: (Long, Long), day: (Long, Long)): Int =
      rs.count { case (ul, uh, dl, dh) =>
        uh >= ux._1 && ul <= ux._2 && dh >= day._1 && dl <= day._2 }
    // day-slice query: the user-sorted layout cannot prune (every
    // file spans all days); the z-layout must
    val zDay = touches(zr, uxAll, daySlice)
    assert(touches(ur, uxAll, daySlice) == ur.length,
      "baseline unexpectedly pruned — day leaked into the ux sort")
    assert(zDay < zr.length,
      s"z-layout did not prune a day slice ($zDay/${zr.length})")
    // user-slice query: BOTH layouts prune — z-order trades a little
    // single-dim selectivity for selectivity on every dim
    assert(touches(zr, uxSlice, dayAll) < zr.length,
      "z-layout did not prune a user slice")
    // rectangle query: z touches no more of its layout (as a
    // fraction) than the single-dim layout does of its own
    val zRect = touches(zr, uxSlice, daySlice).toDouble / zr.length
    val uRect = touches(ur, uxSlice, daySlice).toDouble / ur.length
    assert(zRect <= uRect,
      s"z-layout rectangle scan ($zRect) worse than linear ($uRect)")
  }

  test("zvalN interleaves 3 and 4 dims exactly; dimension count is bounded (round 15)") {
    val r3 = spark.range(1).select(
      ZOrderLayout.zvalN(Seq(lit(1L), lit(0L), lit(0L))).as("a"),
      ZOrderLayout.zvalN(Seq(lit(0L), lit(1L), lit(0L))).as("b"),
      ZOrderLayout.zvalN(Seq(lit(0L), lit(0L), lit(1L))).as("c"),
      ZOrderLayout.zvalN(Seq(lit(1L), lit(1L), lit(1L))).as("abc"),
      ZOrderLayout.zvalN(Seq(lit(2L), lit(0L), lit(0L))).as("a2"),
      ZOrderLayout.zvalN(
        Seq(lit(0x1fffffL), lit(0x1fffffL), lit(0x1fffffL))).as("max"))
      .collect().head
    // dim i's bits land at positions i, i+3, i+6, …
    assert(r3.getAs[Long]("a") == 1L && r3.getAs[Long]("b") == 2L &&
      r3.getAs[Long]("c") == 4L && r3.getAs[Long]("abc") == 7L &&
      r3.getAs[Long]("a2") == 8L)
    // 21 bits × 3 dims = the low 63 bits all set
    assert(r3.getAs[Long]("max") == 0x7fffffffffffffffL)
    val r4 = spark.range(1).select(
      ZOrderLayout.zvalN(Seq(lit(1L), lit(0L), lit(0L), lit(0L))).as("a"),
      ZOrderLayout.zvalN(Seq(lit(0L), lit(0L), lit(0L), lit(1L))).as("d"),
      ZOrderLayout.zvalN(Seq(lit(3L), lit(3L), lit(3L), lit(3L))).as("all3"),
      ZOrderLayout.zvalN(
        Seq(lit(0xffffL), lit(0xffffL), lit(0xffffL), lit(0xffffL)))
        .as("max"))
      .collect().head
    assert(r4.getAs[Long]("a") == 1L && r4.getAs[Long]("d") == 8L &&
      r4.getAs[Long]("all3") == 255L)
    assert(r4.getAs[Long]("max") == 0xffffffffffffffffL.toLong >>> 0 ||
      r4.getAs[Long]("max") == -1L) // 16 bits × 4 dims = all 64 bits
    // monotone per dim with the others fixed (3-D)
    val mono = spark.range(0, 500).select(
      ZOrderLayout.zvalN(Seq(col("id"), lit(9L), lit(4L))).as("z"),
      col("id")).orderBy("id").collect().map(_.getAs[Long]("z"))
    assert(mono.sameElements(mono.sorted), "zvalN not monotone in dim 0")
    // the bound: 5 dims refuse loudly (footer-stat selectivity
    // collapses past 4 — Delta's own guidance)
    val e = intercept[IllegalArgumentException] {
      ZOrderLayout.zvalN(Seq(lit(1L), lit(1L), lit(1L), lit(1L), lit(1L)))
    }
    assert(e.getMessage.contains("2 to 4"), e.getMessage)
  }

  test("3-dim ZORDER BY statement lands a 3-way-selective layout (round 15)") {
    import graft.sources.GraftTable
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("zorder3").toString + "/t"
    // three independent scan dims, arrival-ordered landing
    val df = (0 until 8192).map { i =>
      ((i * 769) % 256L, (i * 257) % 256L, (i * 101) % 256L, s"p$i")
    }.toDF("x", "y", "w", "payload")
    val t = GraftTable.create(spark, root, df.repartition(8))
    val v = spark.sql(
      s"GRAFT OPTIMIZE '$root' ZORDER BY (x, y, w) FILES 8")
      .collect().head.getLong(0)
    assert(v == 2L)
    // content-neutral, and per-file spans shrink on EVERY dim vs the
    // arrival-ordered landing (whose files span ~the whole domain)
    assert(t.read().count() == 8192)
    def spans(vv: Long, dim: String): Long = {
      val files = t.filesAsOf(vv)
      files.map { f =>
        val r = spark.read.parquet(f).agg(min(dim), max(dim)).head
        r.getLong(1) - r.getLong(0)
      }.sum
    }
    Seq("x", "y", "w").foreach { d =>
      assert(spans(2L, d) < spans(1L, d),
        s"3-dim z-layout did not tighten per-file $d spans")
    }
  }

  test("keys past 2^31 still cluster: range normalization defeats spread-mask aliasing (round 16)") {
    import graft.sources.GraftTable
    // the x100 shape that exposed the bug: values at replica * 10^9,
    // far past the 31-bit spread mask — unnormalized, key mod 2^31
    // scrambles the order and every file spans everything
    val wide = spark.range(0, 40000)
      .select((col("id") % 100 * 1000000000L + col("id")).as("k"),
        (col("id") % 97 * 1000000000L + col("id") * 7 % 1000).as("c"),
        (col("id") * 31 % 1000).as("payload"))
    val root = java.nio.file.Files
      .createTempDirectory("graft_zwide").toString + "/t"
    val t = GraftTable.create(spark, root, wide.repartition(8))   // v1
    t.compactZOrder("k", "c", 16)                                 // v2
    val total = t.liveFiles().size
    assert(total >= 8, s"expected a multi-file z layout, got $total")
    // a centered 2-d slice of ~1/8 of each dimension's RANGE
    val pred = col("k").between(45L * 1000000000L, 57L * 1000000000L) &&
      col("c").between(43L * 1000000000L, 55L * 1000000000L)
    val touched = t.prunedFiles(pred).size
    assert(touched < total,
      s"z-order on wide keys pruned nothing ($touched/$total) — " +
        "spread-mask aliasing is back")
    // content neutrality of the fixed rewrite
    assert(t.read().count() == 40000)
    ()
  }

  test("keys past 2^53 cluster through the double quantization: monotone map keeps files range-disjoint (round 17)") {
    import graft.sources.GraftTable
    // 2^62-scale ids: the normalization's double cast quantizes
    // adjacent longs (53-bit mantissa), which may merge neighbors
    // into one normalized cell — but the map stays MONOTONE, so the
    // layout still clusters and stats pruning still bites. This pins
    // the documented intent at ZOrderLayout.zvalNormalizedOver.
    val base = 1L << 62
    val step = 1L << 40 // strides far apart, all above 2^53
    val wide = spark.range(0, 20000)
      .select((lit(base) + col("id") % 100 * step * 100 + col("id"))
          .as("k"),
        (lit(base) + col("id") % 97 * step * 97 + col("id") * 7 % 1000)
          .as("c"),
        (col("id") * 31 % 1000).as("payload"))
    val root = java.nio.file.Files
      .createTempDirectory("graft_zhuge").toString + "/t"
    val t = GraftTable.create(spark, root, wide.repartition(8))   // v1
    t.compactZOrder("k", "c", 16)                                 // v2
    val total = t.liveFiles().size
    assert(total >= 8, s"expected a multi-file z layout, got $total")
    // a centered 2-d slice of ~1/8 of each dimension's range
    val pred =
      col("k").between(base + 45L * step * 100, base + 57L * step * 100) &&
      col("c").between(base + 43L * step * 97, base + 55L * step * 97)
    val touched = t.prunedFiles(pred).size
    assert(touched < total,
      s"z-order at 2^62 keys pruned nothing ($touched/$total) — " +
        "the quantized map lost monotonicity")
    // exactness is untouched: pruning is an optimization, the read
    // re-applies the predicate — and the rewrite is content-neutral
    assert(t.read().count() == 20000)
    assert(t.readWhere(pred).count() ==
      t.read().filter(pred).count())
    ()
  }
}
