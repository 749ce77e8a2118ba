package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.GraftTable
import java.nio.file.Files

/** Parquet checkpoint sidecars (VERDICT r13 item 6): the O(live
  * files) bulk of a checkpoint — file/filedv rows — rides a columnar
  * sidecar next to the text checkpoint, resolution reads
  * newest-format-first, and the text body remains the authoritative
  * fallback. These specs prove the sidecar is (a) written at every
  * checkpoint site (commit loop, vacuum horizon), (b) actually READ
  * (resolution survives a text body whose file lines were tampered
  * away), (c) falls back to text when absent, and (d) round-trips
  * deletion vectors and stats exactly.
  */
class GraftCkptParquetSpec extends SparkSpec {
  import spark.implicits._

  private def multiset(df: DataFrame) =
    df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap

  private def fresh(tag: String) =
    Files.createTempDirectory(s"graft_$tag").toString + "/t"

  private def ckptFiles(root: String, suffix: String) =
    new java.io.File(s"$root/_graft_log").listFiles()
      .filter(f => f.getName.startsWith("ckpt-v") &&
        f.getName.endsWith(suffix))

  test("sidecar written at the commit-loop checkpoint; resolution is sidecar-first with text fallback") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      .limit(1200).cache()
    li.count()
    val root = fresh("ckptpq")
    val t = GraftTable.create(spark, root,
      li.filter(col("l_orderkey") % 12 === 0))
    (1 until 12).foreach(i =>
      t.append(li.filter(col("l_orderkey") % 12 === i)))
    // both forms exist at v8
    assert(ckptFiles(root, ".txt").map(_.getName).toSeq ==
      Seq("ckpt-v000000000008.txt"))
    assert(ckptFiles(root, ".parquet").map(_.getName).toSeq ==
      Seq("ckpt-v000000000008.parquet"))
    val expected = multiset(li)
    assert(multiset(GraftTable.forPath(spark, root).read()) == expected)
    // TAMPER the text body's file lines away (header/schema kept):
    // a fresh handle must still resolve correctly — the proof the
    // sidecar is read first, not just written
    val txt = ckptFiles(root, ".txt").head
    val original = java.nio.file.Files.readAllBytes(txt.toPath)
    val gutted = new String(original, "UTF-8").linesIterator
      .filterNot(l => l.startsWith("file\t") || l.startsWith("filedv\t"))
      .mkString("\n") + "\n"
    java.nio.file.Files.write(txt.toPath, gutted.getBytes("UTF-8"))
    assert(multiset(GraftTable.forPath(spark, root).read()) == expected,
      "resolution did not use the parquet sidecar")
    // restore the text, delete the sidecar: fallback must serve the
    // identical live set (pre-r14 logs have no sidecar)
    java.nio.file.Files.write(txt.toPath, original)
    assert(ckptFiles(root, ".parquet").head.delete())
    assert(multiset(GraftTable.forPath(spark, root).read()) == expected,
      "text fallback broken")
    li.unpersist()
    ()
  }

  test("sidecar round-trips deletion vectors and stats; skip-read still prunes past the checkpoint") {
    val root = fresh("ckptdv")
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice")
    val t = GraftTable.create(spark, root,
      orders.repartitionByRange(4, col("o_orderkey")))          // v1
    // a MoR delete attaches a dv; pad to the checkpoint boundary
    t.deleteWhere(pmod(col("o_orderkey"), lit(13)) === 2, mor = true) // v2
    val after = multiset(t.read())
    (3 to 8).foreach { i =>
      t.addConstraint(s"c$i", s"o_orderkey >= ${-i}"); ()
    }                                                           // v3-v8
    assert(ckptFiles(root, ".parquet").nonEmpty, "no sidecar at v8")
    // fresh handle resolves THROUGH the sidecar: dv rows stay dead
    val t2 = GraftTable.forPath(spark, root)
    assert(multiset(t2.read()) == after,
      "dv lost through the parquet sidecar")
    // stats survive: a selective readWhere prunes files at the log
    val hi = orders.agg(max("o_orderkey")).head.getLong(0)
    val pruned = t2.prunedFiles(col("o_orderkey") === hi)
    assert(pruned.size < t2.liveFiles().size,
      "stats lost through the sidecar: nothing pruned")
    ()
  }

  test("vacuum writes the horizon sidecar and reclaims superseded ones") {
    val root = fresh("ckptvac")
    val t = GraftTable.create(spark, root, Seq((1, "a")).toDF("k", "v"))
    (2 to 20).foreach(i => t.overwrite(Seq((i, "x")).toDF("k", "v")))
    assert(ckptFiles(root, ".parquet").length >= 2) // v8, v16
    t.vacuum(retainVersions = 2, orphanGraceMillis = 0L)
    val names = ckptFiles(root, ".parquet").map(_.getName).toSeq.sorted
    // horizon checkpoint (v19) has a sidecar; pre-horizon ones gone
    assert(names == Seq("ckpt-v000000000019.parquet"), names)
    val t2 = GraftTable.forPath(spark, root)
    assert(t2.read().collect().map(_.getInt(0)).toSeq == Seq(20))
    ()
  }
}
