package graft

import org.apache.spark.sql.functions._
import graft.sources.GraftTable
import java.nio.file.Files

/** DELETION VECTORS (merge-on-read DML): `deleteWhere(mor=true)` /
  * `update(mor=true)` mark rows dead in positional sidecars instead of
  * rewriting data files; reads apply the dv as an anti-join on
  * (file basename, row index); `purge()` materializes; the raw-parquet
  * DSv2 path refuses while dvs are live (reader-feature gate). The
  * cases here pin the invariants the oracled q84/q85 can't see: zero
  * data bytes rewritten, supersede-union on re-delete, full-dead
  * degeneration to removes, restore round-trips, vacuum reclamation,
  * and no-resurrection under later CoW/compact passes.
  */
class GraftDvSpec extends SparkSpec {

  private def multiset(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap

  private def freshRoot() =
    Files.createTempDirectory("graft_dv").toString + "/t"

  private def registry() = Tables.orders(spark, sf)
    .select("o_orderkey", "o_orderstatus", "o_totalprice")
    .repartitionByRange(8, col("o_orderkey"))

  private def rangedTable() = GraftTable.create(spark, freshRoot(), registry())

  private def keyMax = Tables.orders(spark, sf)
    .agg(max("o_orderkey")).head.getLong(0)

  test("MoR delete marks rows dead without touching a single data file") {
    val t = rangedTable()
    val before = t.liveFiles()
    val preAll = multiset(t.read())
    val pred = col("o_orderkey") <= lit(keyMax / 4) &&
      pmod(col("o_orderkey"), lit(11)) === 4
    val want = multiset(t.read().filter(!pred))
    val v = t.deleteWhere(pred, mor = true)
    assert(v == 2, "MoR delete must publish exactly one commit")
    // the dv-applying scan serves the post-delete content
    assert(multiset(t.read()) == want, "post-MoR-delete state wrong")
    // THE merge-on-read contract: the data file set is IDENTICAL —
    // no file rewritten, none removed, none added
    assert(t.liveFiles() == before,
      "MoR delete perturbed the data file set")
    val c = t.readCommit(2)
    assert(c.adds.isEmpty && c.removes.isEmpty && c.dvs.nonEmpty,
      s"expected a pure dv commit, got adds=${c.adds.size} " +
        s"removes=${c.removes.size} dvs=${c.dvs.size}")
    // the sidecar is tiny relative to the data it masks
    val dvBytes = c.dvs.map(_._2.bytes).distinct.sum
    assert(dvBytes < before.map(_._2).sum / 10,
      s"dv sidecar suspiciously large: $dvBytes bytes")
    // dv cardinalities account for every deleted row
    val deleted = t.readVersion(1).filter(pred).count()
    assert(c.dvs.map(_._2.nDeleted).sum == deleted,
      "dv cardinalities disagree with the deleted row count")
    // metadata-only COUNT subtracts the dv cardinality
    assert(t.countRows().contains(preAll.values.map(_.toLong).sum - deleted),
      "countRows did not subtract dv cardinality")
    // time travel to v1 still serves every row
    assert(multiset(t.readVersion(1)) == preAll)
    // readWhere composes with dvs: a predicate into a dv'd file
    val probe = col("o_orderkey") <= lit(keyMax / 8)
    assert(multiset(t.readWhere(probe)) ==
      multiset(t.read().filter(probe)))
  }

  test("a second MoR delete on the same files supersedes with the union") {
    val t = rangedTable()
    val p1 = col("o_orderkey") <= lit(keyMax / 4) &&
      pmod(col("o_orderkey"), lit(7)) === 1
    val p2 = col("o_orderkey") <= lit(keyMax / 4) &&
      pmod(col("o_orderkey"), lit(7)) === 2
    val want = multiset(t.read().filter(!p1 && !p2))
    t.deleteWhere(p1, mor = true) // v2
    t.deleteWhere(p2, mor = true) // v3
    assert(multiset(t.read()) == want, "superseded dv lost positions")
    // the second commit's dv refs supersede: each touched file's
    // cardinality covers BOTH deletes
    val dead1 = t.readVersion(1).filter(p1 || p2).count()
    val live = t.readCommit(3).dvs
    assert(live.nonEmpty && live.map(_._2.nDeleted).sum == dead1,
      "second dv does not carry the union of dead positions")
    // and the intermediate version still reads as after delete #1 only
    assert(multiset(t.readVersion(2)) == multiset(
      t.readVersion(1).filter(!p1)))
  }

  test("MoR update appends only the rewritten slice; old copies go dead via dv") {
    val t = rangedTable()
    val before = t.liveFiles().toSet
    val pred = col("o_orderkey") <= lit(keyMax / 2) &&
      pmod(col("o_orderkey"), lit(13)) === 6
    val want = multiset(t.read().select(col("o_orderkey"),
      when(pred, lit("M")).otherwise(col("o_orderstatus"))
        .as("o_orderstatus"),
      when(pred, col("o_totalprice") * 0.5).otherwise(col("o_totalprice"))
        .as("o_totalprice")))
    val v = t.update(pred,
      Map("o_totalprice" -> (col("o_totalprice") * 0.5),
        "o_orderstatus" -> lit("M")), mor = true)
    assert(v == 2)
    assert(multiset(t.read()) == want, "post-MoR-update state wrong")
    val c = t.readCommit(2)
    // every original file still live untouched + the new slice file(s)
    assert(before.subsetOf(t.liveFiles().toSet),
      "MoR update rewrote an original file")
    assert(c.adds.nonEmpty && c.removes.isEmpty && c.dvs.nonEmpty)
    // the appended slice holds exactly the updated rows
    val sliceRows = c.adds.flatMap(_.stats)
      .flatMap(graft.sources.FileStats.numRows).sum
    assert(sliceRows == t.readVersion(1).filter(pred).count(),
      "MoR update's appended slice is not the matched-row set")
    // CDF images flow from MoR commits exactly like CoW ones
    val feed = t.changeFeed(1).get
    assert(feed.filter(col("_change_type") === "update_preimage").count() ==
      sliceRows)
    assert(feed.filter(col("_change_type") === "update_postimage").count() ==
      sliceRows)
  }

  test("later CoW DML, merge and compact over a dv'd table never resurrect") {
    val t = rangedTable()
    val del = pmod(col("o_orderkey"), lit(9)) === 5
    t.deleteWhere(del, mor = true) // v2: dvs across many files
    val afterDel = multiset(t.read())
    // CoW update over files that carry dvs: survivors only
    val upd = pmod(col("o_orderkey"), lit(9)) === 6
    t.update(upd, Map("o_orderstatus" -> lit("X"))) // v3, copy-on-write
    val want3 = multiset(t.readVersion(2).select(col("o_orderkey"),
      when(upd, lit("X")).otherwise(col("o_orderstatus"))
        .as("o_orderstatus"), col("o_totalprice")))
    assert(multiset(t.read()) == want3,
      "CoW update over dv'd files resurrected or lost rows")
    // merge over the remaining dv'd files: dead keys are NOT matched
    // rows (they must insert as new, not update in place)
    val batch = Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .filter(pmod(col("o_orderkey"), lit(9)) === 5)
      .limit(50).select(col("o_orderkey"),
        lit("R").as("o_orderstatus"), col("o_totalprice"))
    t.merge(batch, "o_orderkey") // v4
    val merged = t.read()
    assert(merged.filter(col("o_orderstatus") === "R").count() == 50,
      "merge over dv'd files mishandled dead keys")
    // compact materializes: content stable, dvs cleared
    val pre = multiset(t.read())
    t.compact(1L << 30) // v5
    assert(multiset(t.read()) == pre, "compact changed dv'd content")
    assert(!t.hasDvAsOf(t.latestVersion),
      "compact left dv refs on removed files")
    assert(afterDel != null)
  }

  test("a delete covering whole files degenerates to removes, and an emptied table reads empty") {
    val t = rangedTable()
    val v = t.deleteWhere(lit(true), mor = true) // every row everywhere
    assert(v == 2)
    val c = t.readCommit(2)
    assert(c.removes.nonEmpty && c.dvs.isEmpty,
      "full-dead files must remove, not carry a total dv")
    assert(t.read().count() == 0)
    assert(t.read().schema.fieldNames.toSeq ==
      Seq("o_orderkey", "o_orderstatus", "o_totalprice"))
  }

  test("the raw-parquet DSv2 path refuses while dvs are live; purge reopens it") {
    val t = rangedTable()
    t.deleteWhere(pmod(col("o_orderkey"), lit(17)) === 3, mor = true)
    val e = intercept[UnsupportedOperationException] {
      spark.read.format("graft").load(t.root).count()
    }
    assert(e.getMessage.contains("deletionVectors"), e.getMessage)
    // SQL time travel through the catalog refuses the same way
    spark.conf.set("spark.sql.catalog.gdv",
      classOf[graft.sources.GraftCatalog].getName)
    val e2 = intercept[Exception] {
      spark.sql(s"SELECT count(*) FROM gdv.`${t.root}`").collect()
    }
    def chain(x: Throwable): Seq[String] =
      if (x == null) Seq.empty
      else Option(x.getMessage).toSeq ++ chain(x.getCause)
    assert(chain(e2).exists(_.contains("deletionVectors")),
      chain(e2).mkString("|"))
    val want = multiset(t.read())
    val vPurge = t.purge()
    assert(t.readCommit(vPurge).action == "purge")
    assert(!t.hasDvAsOf(t.latestVersion))
    // content-neutral, and the DSv2 path serves it again
    assert(multiset(spark.read.format("graft").load(t.root)) == want,
      "purge changed the live row multiset")
    // the row-level change feed treats purge as content-neutral
    assert(t.changeFeed(vPurge - 1).isEmpty)
  }

  test("restore round-trips dv states in both directions") {
    val t = rangedTable()
    val p = col("o_orderkey") <= lit(keyMax / 4) &&
      pmod(col("o_orderkey"), lit(5)) === 2
    val v1All = multiset(t.read())
    t.deleteWhere(p, mor = true) // v2
    val v2State = multiset(t.read())
    t.purge() // v3: dvs materialized
    assert(multiset(t.read()) == v2State)
    // back to the dv'd version: dv refs re-established in one commit
    t.restore(2) // v4
    assert(multiset(t.read()) == v2State, "restore to dv'd version wrong")
    assert(t.hasDvAsOf(t.latestVersion), "restore lost the dv refs")
    // and back to the pre-delete version: dvs cleared
    t.restore(1) // v5
    assert(multiset(t.read()) == v1All, "restore to pre-dv version wrong")
    assert(!t.hasDvAsOf(t.latestVersion))
  }

  test("vacuum keeps live dv sidecars and reclaims superseded ones") {
    val t = rangedTable()
    val p1 = pmod(col("o_orderkey"), lit(23)) === 1
    val p2 = pmod(col("o_orderkey"), lit(23)) === 2
    t.deleteWhere(p1, mor = true) // v2: dv generation 1
    val gen1 = t.readCommit(2).dvs.map(_._2.path).distinct
    t.deleteWhere(p2, mor = true) // v3: supersedes gen 1 on shared files
    val want = multiset(t.read())
    t.vacuum(retainVersions = 1, orphanGraceMillis = 0)
    // superseded gen-1 sidecars are gone...
    val root = new java.io.File(t.root)
    gen1.foreach { d =>
      val dir = new java.io.File(root, d)
      assert(!dir.exists() || dir.listFiles().forall(f =>
        !f.getName.endsWith(".parquet")),
        s"vacuum kept a superseded dv sidecar: $d")
    }
    // ...and the retained version still reads exactly
    assert(multiset(t.read()) == want, "vacuum broke the live dv read")
  }

  test("vacuum dry-run lists exactly the reclaim set and deletes nothing") {
    val t = rangedTable()
    t.deleteWhere(pmod(col("o_orderkey"), lit(23)) === 1, mor = true) // v2
    t.deleteWhere(pmod(col("o_orderkey"), lit(23)) === 2, mor = true) // v3
    def walkParquet(): Set[String] = {
      def w(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toIndexedSeq.flatMap(w) else Seq(f)
      w(new java.io.File(t.root))
        .filter(_.getName.endsWith(".parquet")).map(_.toString).toSet
    }
    val before = walkParquet()
    val plan = t.vacuumPlan(retainVersions = 1, orphanGraceMillis = 0)
    // READ-ONLY: the dry run changed nothing on disk, not even a
    // checkpoint
    assert(walkParquet() == before, "vacuumPlan deleted files")
    assert(plan.files.nonEmpty && plan.bytes > 0,
      "superseded gen-1 sidecars should be reclaimable")
    assert(plan.commits == Seq(1L, 2L),
      s"log horizon wrong: ${plan.commits}")
    // live files never appear in the plan
    val live = t.liveFiles().map(_._1).toSet ++
      t.readCommit(3).dvs.map(_._2.path).flatMap(d =>
        before.filter(_.contains(d)).map(_ => d))
    assert(plan.files.map(_._1).forall(r => !live.contains(r)),
      "dry run listed a live file")
    // execution reclaims EXACTLY the plan (same snapshot, no writers)
    val want = multiset(t.read())
    t.vacuum(retainVersions = 1, orphanGraceMillis = 0)
    val after = walkParquet()
    val gone = before -- after
    val planned = plan.files.map(f => s"${t.root}/${f._1}").toSet
    assert(gone == planned,
      s"vacuum diverged from its dry run: extra=${(gone -- planned).take(3)}" +
        s" missed=${(planned -- gone).take(3)}")
    assert(multiset(t.read()) == want)
    ()
  }

  test("MoR refuses on hive-partitioned tables") {
    val root = freshRoot()
    val t = GraftTable.forPath(spark, root)
    t.appendPartitioned(Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice"),
        pmod(col("o_orderkey"), lit(4)).as("bucket")), "bucket")
    val e = intercept[IllegalArgumentException] {
      t.deleteWhere(col("o_orderkey") === 1, mor = true)
    }
    assert(e.getMessage.contains("merge-on-read"), e.getMessage)
  }
}
