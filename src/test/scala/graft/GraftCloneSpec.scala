package graft

import org.apache.spark.sql.functions._
import graft.sources.GraftTable
import java.nio.file.Files

/** SHALLOW CLONE + MANIFEST EXPORT: `cloneTo` publishes a zero-copy
  * metadata-only commit referencing the source's files by absolute
  * path (Delta CLONE); the clone diverges through its own DML without
  * perturbing the source; vacuum on the clone can never reclaim
  * source data; compaction localizes external references; dvs,
  * constraints and column mapping carry over. `exportManifest` writes
  * the symlink-style file list an external parquet engine reads, and
  * refuses the dv / column-mapped versions raw readers would misread.
  */
class GraftCloneSpec extends SparkSpec {

  private def multiset(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap

  private def freshRoot(tag: String) =
    Files.createTempDirectory(s"graft_clone_$tag").toString + "/t"

  private def orders() = Tables.orders(spark, sf)
    .select("o_orderkey", "o_orderstatus", "o_totalprice")
    .repartitionByRange(6, col("o_orderkey"))

  /** Every data file physically under `root` (recursive). */
  private def filesUnder(root: String): Set[String] = {
    val base = new java.io.File(root)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    if (!base.exists()) Set.empty
    else walk(base).map(_.getPath).filter(_.endsWith(".parquet")).toSet
  }

  test("clone is metadata-only, reads identically, then diverges without touching the source") {
    val srcRoot = freshRoot("src")
    val src = GraftTable.create(spark, srcRoot, orders())     // v1
    src.append(orders().filter(pmod(col("o_orderkey"), lit(2)) === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2))   // v2
    val srcV = src.latestVersion
    val want = multiset(src.read())
    val srcBytes = filesUnder(srcRoot)

    val cloneRoot = freshRoot("dst")
    val c = src.cloneTo(cloneRoot)
    // metadata-only: not one data file landed under the clone root
    assert(filesUnder(cloneRoot).isEmpty,
      "shallow clone copied data files")
    assert(multiset(c.read()) == want, "clone read differs from source")
    // stats carried: data skipping still prunes on the clone
    val hi = Tables.orders(spark, sf).agg(max("o_orderkey")).head.getLong(0)
    val pruned = c.prunedFiles(col("o_orderkey") === lit(hi))
    assert(pruned.nonEmpty && pruned.size < c.liveFiles().size,
      s"clone lost its file stats: ${pruned.size} of ${c.liveFiles().size}")

    // diverge the clone: CoW delete + append
    c.deleteWhere(pmod(col("o_orderkey"), lit(7)) === 0)
    c.append(orders().filter(col("o_orderstatus") === "P")
      .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L)))
    val cloneWant = want // source state unchanged by clone DML
    assert(multiset(src.read()) == cloneWant, "clone DML leaked into source")
    assert(src.latestVersion == srcV, "clone DML advanced the source log")
    assert(filesUnder(srcRoot) == srcBytes,
      "clone DML created/removed files under the source root")
    // and the clone serves its own diverged state
    val expect = multiset(
      src.read().filter(pmod(col("o_orderkey"), lit(7)) =!= 0)
        .unionByName(orders().filter(col("o_orderstatus") === "P")
          .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L))))
    assert(multiset(c.read()) == expect, "diverged clone state wrong")
    // time travel on the clone: v1 is the cloned snapshot
    assert(multiset(c.readVersion(1)) == want, "clone v1 not the snapshot")
    // change feed refuses ranges crossing the clone commit
    intercept[IllegalStateException] { c.changeFeed(0) }
  }

  test("vacuum on a clone never reclaims source files; compaction localizes") {
    val srcRoot = freshRoot("vsrc")
    val src = GraftTable.create(spark, srcRoot,
      orders().repartition(8)) // many small files: compactable
    val srcBytes = filesUnder(srcRoot)
    val c = src.cloneTo(freshRoot("vdst"))
    val want = multiset(c.read())
    // localize: compact rewrites every undersized (external) file
    // into clone-local files and the external refs leave the live set
    c.compact(targetBytes = 1L << 30)
    assert(c.liveFiles().map(_._1).forall(p => !p.startsWith("/")),
      s"compaction left external references: ${c.liveFiles().map(_._1)}")
    assert(multiset(c.read()) == want, "localizing compaction changed content")
    // vacuum the clone's history aggressively: the dropped version 1
    // referenced ONLY source files — none may be deleted
    c.vacuum(retainVersions = 1, orphanGraceMillis = 0L)
    assert(filesUnder(srcRoot) == srcBytes,
      "vacuum on the clone deleted source files")
    assert(multiset(src.read()) == want, "source corrupted by clone vacuum")
    assert(multiset(c.read()) == want, "clone corrupted by its own vacuum")
  }

  test("clone carries dvs, constraints and column mapping; manifest gates both") {
    val srcRoot = freshRoot("dsrc")
    val src = GraftTable.create(spark, srcRoot, orders())
    src.addConstraint("price_pos", "o_totalprice > 0")
    src.deleteWhere(pmod(col("o_orderkey"), lit(5)) === 1, mor = true)
    val want = multiset(src.read())
    val c = src.cloneTo(freshRoot("ddst"))
    assert(multiset(c.read()) == want, "dv'd clone read differs")
    assert(c.hasDvAsOf(c.latestVersion), "clone dropped the dvs")
    // the cloned constraint enforces on the CLONE's writes
    intercept[Exception] {
      c.append(spark.range(1).selectExpr("id as o_orderkey",
        "'F' as o_orderstatus", "cast(-1.0 as double) as o_totalprice"))
    }
    // manifest: refused while dvs are live, served after purge
    intercept[IllegalArgumentException] { c.exportManifest() }
    c.purge()
    val mf = c.exportManifest()
    val paths = scala.io.Source.fromFile(mf).getLines().toSeq
    assert(paths.nonEmpty && paths.forall(_.endsWith(".parquet")))
    assert(multiset(spark.read.parquet(paths: _*)) == want,
      "manifest readback differs from the table read")
    // column mapping: a renamed source clones with logical names…
    val src2 = GraftTable.create(spark, freshRoot("csrc"), orders())
    src2.renameColumn("o_totalprice", "price")
    val c2 = src2.cloneTo(freshRoot("cdst"))
    assert(c2.read().columns.toSeq ==
      Seq("o_orderkey", "o_orderstatus", "price"),
      "clone lost the column mapping")
    // …and the manifest refuses (raw readers would see physical names)
    intercept[IllegalArgumentException] { c2.exportManifest() }
    // a non-empty destination refuses
    intercept[IllegalArgumentException] { src2.cloneTo(srcRoot) }
  }

  test("MoR DML on a clone supersedes INHERITED (absolute-path) dvs correctly") {
    val src = GraftTable.create(spark, freshRoot("msrc"), orders())
    val hi = Tables.orders(spark, sf).agg(max("o_orderkey")).head.getLong(0)
    src.deleteWhere(pmod(col("o_orderkey"), lit(5)) === 1, mor = true)
    val c = src.cloneTo(freshRoot("mdst"))
    // a second MoR delete on the CLONE must fold the inherited dv's
    // positions in (supersede) — resolving the inherited sidecar's
    // absolute path under the clone root would fail or resurrect
    val want = multiset(src.read()
      .filter(!(col("o_orderkey") <= lit(hi / 2) &&
        pmod(col("o_orderkey"), lit(7)) === 3)))
    c.deleteWhere(col("o_orderkey") <= lit(hi / 2) &&
      pmod(col("o_orderkey"), lit(7)) === 3, mor = true)
    assert(multiset(c.read()) == want,
      "MoR delete on a dv-carrying clone lost or resurrected rows")
    // neither delete generation leaked: the first MoR delete's rows
    // stay dead too
    assert(c.read().filter(pmod(col("o_orderkey"), lit(5)) === 1).count()
      == 0, "inherited dv positions resurrected")
  }

  test("clone carries the committed-tag ledger: replayed epochs no-op") {
    val src = GraftTable.create(spark, freshRoot("tsrc"), orders())
    val batch = orders().filter(col("o_orderstatus") === "P")
      .withColumn("o_orderkey", col("o_orderkey") + lit(200000000L))
    assert(src.appendIdempotent(batch, "epoch-7").isDefined)
    val c = src.cloneTo(freshRoot("tdst"))
    val want = multiset(c.read())
    // the stream repointed at the clone replays its checkpointed
    // epoch: the ledger carried over, so the re-land must NO-OP
    assert(c.appendIdempotent(batch, "epoch-7").isEmpty,
      "clone lost the source's committed-tag ledger — epoch re-landed")
    assert(multiset(c.read()) == want, "replayed epoch changed the clone")
    // a genuinely new epoch still lands
    assert(c.appendIdempotent(batch
      .withColumn("o_orderkey", col("o_orderkey") + lit(1L)), "epoch-8")
      .isDefined)
  }

  test("clone of a clone references the ORIGINAL files (absOf pass-through)") {
    val srcRoot = freshRoot("ccsrc")
    val src = GraftTable.create(spark, srcRoot, orders())
    val want = multiset(src.read())
    val c1 = src.cloneTo(freshRoot("cc1"))
    val c2 = c1.cloneTo(freshRoot("cc2"))
    assert(multiset(c2.read()) == want, "second-generation clone differs")
    // the grandchild's live set points at the ORIGINAL table's files —
    // external paths pass through absOf unchanged, so a clone chain
    // never builds indirection through intermediate roots
    assert(c2.filesAsOf(1).forall(_.startsWith(srcRoot)),
      s"clone-of-clone references non-original paths: ${c2.filesAsOf(1).take(2)}")
  }

  test("manifest export on a hive-partitioned table: per-partition manifests, readback exact") {
    val root = freshRoot("psrc")
    val t = GraftTable.forPath(spark, root)
    t.appendPartitioned(orders()
      .withColumn("bucket", pmod(col("o_orderkey"), lit(4L))), "bucket")
    // the symlink-manifest layout: one manifest per <pc>=<v> dir, so
    // an external engine can declare the table PARTITIONED BY (pc)
    // and recover values from the manifest directories
    val mdir = new java.io.File(t.exportManifest())
    val subs = mdir.listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(subs == Set("bucket=0", "bucket=1", "bucket=2", "bucket=3"),
      s"expected one manifest dir per partition value, got $subs")
    // readback exactly reproduces the partition-pruned reader for
    // every value — the external engine's view matches the table's
    (0L to 3L).foreach { v =>
      val paths = scala.io.Source.fromFile(
        new java.io.File(mdir, s"bucket=$v/manifest.txt"))
        .getLines().toSeq
      assert(paths.nonEmpty && paths.forall(_.contains(s"/bucket=$v/")))
      val external = spark.read.parquet(paths: _*)
        .withColumn("bucket", lit(v))
      assert(multiset(external) ==
        multiset(t.readPartitionedColumn("bucket", Seq(v)).get),
        s"manifest readback differs for bucket=$v")
    }
  }

  test("a PARTITIONED table clones: pruned reads and partition-scoped DML work on external paths") {
    val srcRoot = freshRoot("parts")
    val src = GraftTable.forPath(spark, srcRoot)
    src.appendPartitioned(orders()
      .withColumn("bucket", pmod(col("o_orderkey"), lit(4L))), "bucket")
    val c = src.cloneTo(freshRoot("partd"))
    // external rel paths keep their bucket=<v> components, so the
    // partition-pruned reader plans only the probed value's files
    val pruned = c.readPartitionedColumn("bucket", Seq(2L)).get
    val want2 = multiset(src.read()
      .filter(pmod(col("o_orderkey"), lit(4L)) === 2)
      .withColumn("bucket", pmod(col("o_orderkey"), lit(4L))))
    assert(multiset(pruned) == want2, "pruned read on a partitioned clone wrong")
    // partition-scoped CoW delete on the clone: rewrites restore the
    // partition column from the EXTERNAL path and re-stage locally,
    // leaving the source untouched
    val before = multiset(src.read())
    c.deleteWhere(pmod(col("o_orderkey"), lit(9)) === 4)
    assert(multiset(src.read()) == before, "partitioned clone DML leaked")
    assert(multiset(c.read()) == multiset(
      src.read().filter(pmod(col("o_orderkey"), lit(9)) =!= 4)),
      "partitioned clone delete wrong")
    // and the pruned read still works on the mixed external+local set
    val after2 = c.readPartitionedColumn("bucket", Seq(2L)).get
    assert(multiset(after2) == multiset(pruned.filter(
      pmod(col("o_orderkey"), lit(9)) =!= 4)),
      "post-DML pruned read on the clone wrong")
  }
}
