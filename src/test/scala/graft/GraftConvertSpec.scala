package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.GraftTable
import java.nio.file.Files

/** IN-PLACE CONVERT (Delta's `CONVERT TO DELTA`): adopt an existing
  * plain-parquet directory into the commit log without rewriting a
  * byte, after which the full surface (reads, stats skipping, DML,
  * time travel, vacuum conservatism) applies.
  */
class GraftConvertSpec extends SparkSpec {

  private def multiset(df: DataFrame) =
    df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap

  private def fresh(tag: String) =
    Files.createTempDirectory(s"graft_$tag").toString + "/t"

  test("convert adopts a flat parquet dir in place: no rewrite, stats skipping, DML, time travel") {
    val dir = fresh("cvflat")
    val src = Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    // range-partitioned landing: files carry disjoint key ranges, so
    // the footer stats recorded at convert can actually prune
    src.repartitionByRange(5, col("o_orderkey")).write.parquet(dir)
    val want = multiset(src)
    val filesBefore = {
      def w(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toIndexedSeq.flatMap(w) else Seq(f)
      w(new java.io.File(dir)).filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getPath, f.lastModified)).toSet
    }
    val t = GraftTable.convert(spark, dir)
    assert(t.latestVersion == 1 && t.readCommit(1).action == "convert")
    // adoption is metadata-only: the original files are byte-for-byte
    // untouched (same paths, same mtimes)
    val filesAfter = {
      def w(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toIndexedSeq.flatMap(w) else Seq(f)
      w(new java.io.File(dir)).filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getPath, f.lastModified)).toSet
    }
    assert(filesAfter == filesBefore, "convert touched data files")
    assert(multiset(t.read()) == want, "converted read differs from source")
    // footer stats were recorded during the walk: log-level skipping
    // prunes on a key predicate without any re-scan
    val hi = src.agg(max("o_orderkey")).head.getLong(0)
    val pruned = t.prunedFiles(col("o_orderkey") <= hi / 10)
    assert(pruned.size < t.liveFiles().size,
      s"no skipping on converted table: ${pruned.size}/${t.liveFiles().size}")
    // copy-on-write DML retires converted originals LOGICALLY
    t.deleteWhere(col("o_orderstatus") === "F") // v2
    assert(t.read().filter(col("o_orderstatus") === "F").count() == 0)
    assert(multiset(t.readVersion(1)) == want,
      "time travel to the convert version lost the original rows")
    // ...and vacuum stays conservative: converted originals live
    // OUTSIDE the table-managed data/ dir, so the orphan sweep never
    // reclaims them even after DML retired them (clone-source rule)
    val plan = t.vacuumPlan(retainVersions = 1, orphanGraceMillis = 0L)
    assert(plan.files.isEmpty,
      s"vacuum would reclaim converted originals: ${plan.files.take(3)}")
    assert(t.readVersion(1).count() == src.count(), "originals intact")
    ()
  }

  test("convert adopts a hive-partitioned dir: payload schema, pruned partition reads") {
    val dir = fresh("cvpart")
    val src = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice"),
        pmod(col("o_orderkey"), lit(4L)).as("bucket"))
    src.write.partitionBy("bucket").parquet(dir)
    val t = GraftTable.convert(spark, dir)
    // recorded schema is the FILES' payload schema — the partition
    // column stays path-borne (appendPartitioned's convention)
    assert(t.read().schema.fieldNames.toSeq ==
      Seq("o_orderkey", "o_totalprice"))
    assert(t.read().count() == src.count())
    // the partition-subset reader prunes from the log and restores
    // the value from the adopted paths
    val want2 = multiset(src.filter(col("bucket") === 2))
    val got2 = multiset(t.readPartitionedColumn("bucket", Seq(2L)).get
      .select("o_orderkey", "o_totalprice", "bucket"))
    assert(got2 == want2, "partition-pruned read on converted table wrong")
    ()
  }

  test("fsck drops references to files deleted out-of-band; dry run reports without committing") {
    val root = fresh("fsck")
    val src = Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderstatus")
      .repartitionByRange(4, col("o_orderkey"))
    val t = GraftTable.create(spark, root, src)
    val total = src.count()
    // delete one data file BEHIND the log's back (an out-of-band
    // lifecycle policy, the failure fsck exists for)
    val victim = t.liveFiles().map(_._1).min
    val lostRows = spark.read.parquet(s"$root/$victim").count()
    new java.io.File(root, victim).delete()
    // the read now fails on the missing file
    intercept[Throwable] { t.read().count() }
    // dry run reports the missing reference, commits nothing
    val v = t.latestVersion
    assert(spark.sql(s"GRAFT FSCK '$root' DRY RUN").collect()
      .map(_.getString(0)).toSeq == Seq(victim))
    assert(t.latestVersion == v, "dry run must not commit")
    // repair: one fsck commit, table servable, loss explicit
    assert(spark.sql(s"GRAFT FSCK '$root'").collect()
      .map(_.getString(0)).toSeq == Seq(victim))
    assert(t.latestVersion == v + 1 &&
      t.readCommit(v + 1).action == "fsck")
    assert(t.read().count() == total - lostRows)
    // a healthy table fscks to an empty report and no commit
    assert(spark.sql(s"GRAFT FSCK '$root'").collect().isEmpty)
    assert(t.latestVersion == v + 1)
    ()
  }

  test("convert adopts a string-partitioned hive layout: partmeta recorded, DML restores strings, pruned reads work") {
    val dir = fresh("cvstr")
    val src = Tables.documents(spark, sf).select("doc_id", "text", "lang")
    src.write.partitionBy("lang").parquet(dir)
    val t = GraftTable.convert(spark, dir)
    // the partition TYPE is recorded in the log (r12's refusal is
    // replaced by Delta-style adoption): restore knows lang is string
    val pm = t.partMetaAt(t.latestVersion)
    assert(pm.map(p => (p.col, p.tpe.catalogString)) ==
      Seq(("lang", "string")))
    assert(t.protocolAt(t.latestVersion)
      .contains("stringPartitionValues"))
    // pruned read restores the string value from the paths
    val langs = t.partitionValuesString("lang")
    assert(langs.nonEmpty && langs.forall(_ != null))
    val one = t.readPartitionedColumnString("lang", Seq(langs.head)).get
    assert(multiset(one) ==
      multiset(src.filter(col("lang") === langs.head)))
    // copy-on-write DML restores the partition value from the path
    // and re-stages survivors UNDER their value dirs — the exact
    // corruption the r12 refusal guarded against, now done right
    val want = multiset(src.filter(col("lang") =!= langs.head))
    t.deleteWhere(col("lang") === langs.head)
    assert(multiset(t.read()
      .join(src.select("doc_id", "lang"), "doc_id")
      .select("doc_id", "text", "lang")) == want)
    // the rewritten files still carry value dirs: pruning keeps working
    val rest = t.readPartitionedColumnString("lang", langs.tail).get
    assert(rest.select("lang").distinct().collect().map(_.getString(0))
      .toSet == langs.tail.toSet)
    ()
  }

  test("convert adopts multi-level hive layouts: ordered key list recorded, per-key types inferred") {
    // two-level layout: a=…/b=… (the date=…/hour=… shape) — round 14
    // replaces the r12/r13 single-key refusal with full adoption:
    // partmeta records the ORDERED key chain and each key's type
    val dir = fresh("cvml")
    Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        (col("o_orderkey") % 3).as("a"),
        (col("o_orderkey") % 2).as("b"))
      .write.partitionBy("a", "b").parquet(dir)
    val t = GraftTable.convert(spark, dir)
    assert(t.partMetaAt(1).map(p => (p.col, p.tpe.catalogString)) ==
      Seq(("a", "bigint"), ("b", "bigint")))
    // a mixed per-key type chain: long outer, string inner
    val dir2 = fresh("cvml2")
    Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        (col("o_orderkey") % 3).as("a"),
        concat(lit("x"), (col("o_orderkey") % 2)).as("b"))
      .write.partitionBy("a", "b").parquet(dir2)
    val t2 = GraftTable.convert(spark, dir2)
    assert(t2.partMetaAt(1).map(p => (p.col, p.tpe.catalogString)) ==
      Seq(("a", "bigint"), ("b", "string")))
    assert(t2.protocolAt(1).contains("stringPartitionValues"))
    // an INCONSISTENTLY-nested tree still refuses: one leaf flat,
    // the rest two-level (half-adoption would lose pruned reads)
    val dir3 = fresh("cvml3")
    Tables.orders(spark, sf).limit(50)
      .select(col("o_orderkey"), (col("o_orderkey") % 2).as("a"),
        (col("o_orderkey") % 3).as("b"))
      .write.partitionBy("a", "b").parquet(dir3)
    Tables.orders(spark, sf).limit(10).select(col("o_orderkey"))
      .write.mode("append").parquet(dir3)
    val e = intercept[IllegalArgumentException] {
      GraftTable.convert(spark, dir3)
    }
    assert(e.getMessage.contains("inconsistently-nested") ||
      e.getMessage.contains("partition chain"), e.getMessage)
    ()
  }

  test("convert PARTITIONED BY type override; declared-column mismatch refuses") {
    // an all-integral layout whose key is LOGICALLY a string (the
    // reference's Master_data SKU-style codes): inference would say
    // long; the explicit partition schema pins string — Delta
    // CONVERT's PARTITIONED BY contract
    val dir = fresh("cvdecl")
    Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        (col("o_orderkey") % 3).cast("string").as("code"))
      .write.partitionBy("code").parquet(dir)
    val t = GraftTable.convert(spark, dir,
      Seq("code" -> org.apache.spark.sql.types.StringType))
    assert(t.partMetaAt(t.latestVersion)
      .map(_.tpe.catalogString) == Seq("string"))
    val vs = t.partitionValuesString("code")
    assert(vs.toSet == Set("0", "1", "2"))
    // SQL statement flavor, with the declared column checked
    val dir3 = fresh("cvdecl3")
    Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        (col("o_orderkey") % 2).cast("string").as("half"))
      .write.partitionBy("half").parquet(dir3)
    val e = intercept[Exception] {
      spark.sql(s"GRAFT CONVERT '$dir3' PARTITIONED BY (wrong string)")
        .collect()
    }
    assert(e.getMessage.contains("declared PARTITIONED BY"),
      e.getMessage)
    // the typo'd statement must leave NOTHING behind (ADVICE r13: the
    // old post-commit check left v1 converted, and the corrected
    // re-run then hit 'table already exists')
    assert(GraftTable.forPath(spark, dir3).latestVersion == 0,
      "a refused CONVERT must not leave a committed table")
    spark.sql(s"GRAFT CONVERT '$dir3' PARTITIONED BY (half string)")
      .collect()
    assert(GraftTable.forPath(spark, dir3)
      .partitionValuesString("half").toSet == Set("0", "1"))
    ()
  }

  test("fsck drops a file whose DV sidecar is missing (no resurrection)") {
    val root = fresh("fsckdv")
    val t = GraftTable.create(spark, root, Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderstatus")
      .repartitionByRange(4, col("o_orderkey")))
    t.deleteWhere(pmod(col("o_orderkey"), lit(5)) === 1, mor = true)
    val afterDelete = t.read().count()
    // remove the dv sidecar directory out-of-band (the realistic
    // loss: a lifecycle rule deleting by prefix)
    val dvDir = new java.io.File(root, "dv")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    assert(dvDir.exists, "expected a dv sidecar dir")
    rm(dvDir)
    intercept[Throwable] { t.read().count() }
    // fsck drops EVERY file attached to the lost sidecar — surviving
    // rows go with it (conservative), deleted rows can never come back
    val dropped = t.fsck()
    assert(dropped.nonEmpty)
    val served = t.read()
    assert(served.count() < afterDelete)
    assert(served.filter(pmod(col("o_orderkey"), lit(5)) === 1).count()
      == 0, "fsck resurrected MoR-deleted rows")
    ()
  }

  test("GRAFT CONVERT statement: returns (version, n_files); refusals fire") {
    val dir = fresh("cvsql")
    Tables.region(spark, sf).write.parquet(dir)
    val r = spark.sql(s"GRAFT CONVERT '$dir'").collect()
    assert(r.length == 1 && r.head.getLong(0) == 1L && r.head.getLong(1) >= 1L)
    assert(GraftTable.forPath(spark, dir).read().count() ==
      Tables.region(spark, sf).count())
    // converting a graft table refuses (it already has a log)
    val e = intercept[IllegalArgumentException] {
      GraftTable.convert(spark, dir)
    }
    assert(e.getMessage.contains("already"), e.getMessage)
    // converting an empty dir refuses
    val empty = Files.createTempDirectory("graft_cvempty").toString
    val e2 = intercept[IllegalArgumentException] {
      GraftTable.convert(spark, empty)
    }
    assert(e2.getMessage.contains("no parquet"), e2.getMessage)
    ()
  }
}
