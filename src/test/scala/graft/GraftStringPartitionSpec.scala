package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.GraftTable
import java.nio.file.Files

/** String-valued partition columns end-to-end (VERDICT r12 item 1):
  * the partition layer records the key's TYPE in the log (`partmeta`
  * row), stages values through Spark's own hive-path escaping, and
  * restores them with the codegen'd unescape — so `country=India`
  * layouts (the reference's Master_data shape) land, convert, DML
  * and prune exactly like integer buckets. Also pins the ADVICE r12
  * partition-subset-reader fix (read through the recorded physical
  * schema) and the per-commit protocol row.
  */
class GraftStringPartitionSpec extends SparkSpec {
  import spark.implicits._

  private def multiset(df: DataFrame) =
    df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap

  private def fresh(tag: String) =
    Files.createTempDirectory(s"graft_$tag").toString + "/t"

  // values exercising the full escape surface: '=' and '/' (hive
  // escape set), space (NOT escaped — must survive verbatim), '%'
  // (the escape character itself), ':' and unicode
  private val hardValues = Seq(
    "India", "South Africa", "a=b", "a/b", "100%", "k:v", "ap—南")

  private def hardDf = {
    val rows = for {
      (v, i) <- hardValues.zipWithIndex
      j <- 0 until 4
    } yield (i * 10 + j, s"payload_${i}_$j", v)
    rows.toDF("id", "payload", "country")
  }

  test("appendPartitioned stages escaped string dirs and every reader round-trips them") {
    val root = fresh("strpart")
    val t = GraftTable.forPath(spark, root)
    t.appendPartitioned(hardDf, "country")
    // partmeta + protocol recorded at v1
    assert(t.partMetaAt(1).map(p => (p.col, p.tpe.catalogString)) ==
      Seq(("country", "string")))
    assert(t.protocolAt(1).contains("stringPartitionValues"))
    // values round-trip UNESCAPED through the distinct-values reader
    assert(t.partitionValuesString("country").toSet == hardValues.toSet)
    // the escaped tokens really are on disk (the '=' value dir is not
    // a literal '=': that would break hive layout parsing)
    def walk(f: java.io.File): Seq[String] =
      if (f.isDirectory) f.listFiles().toIndexedSeq.flatMap(walk)
      else Seq(f.getPath)
    val paths = walk(new java.io.File(root)).mkString("\n")
    assert(paths.contains("country=a%3Db"), paths.take(500))
    assert(paths.contains("country=a%2Fb"))
    assert(paths.contains("country=South Africa"))
    // subset read restores the exact logical values
    for (v <- hardValues) {
      val got = t.readPartitionedColumnString("country", Seq(v)).get
      assert(multiset(got.select("id", "payload", "country")) ==
        multiset(hardDf.filter(col("country") === v)), s"value '$v'")
    }
    // the payload-only subset reader prunes on the same tokens
    val two = t.readPartitionsString("country", hardValues.take(2)).get
    assert(two.count() == 8)
    ()
  }

  test("copy-on-write DML restores string partition values and re-stages under value dirs") {
    val root = fresh("strdml")
    val t = GraftTable.forPath(spark, root)
    t.appendPartitioned(hardDf, "country")
    // delete one row of ONE country by a payload predicate: the
    // rewrite must land survivors back under 'country=a=b' (escaped),
    // not under country=null — the exact corruption the r12 integer-
    // only contract refused to risk
    t.deleteWhere(col("country") === "a=b" && col("id") === 20)
    val want = multiset(
      hardDf.filter(!(col("country") === "a=b" && col("id") === 20)))
    val all = t.readPartitionedColumnString("country", hardValues).get
    assert(multiset(all.select("id", "payload", "country")) == want)
    // update referencing + preserving the partition column
    t.update(col("country") === "100%", Map("payload" -> lit("pct")))
    val pct = t.readPartitionedColumnString("country", Seq("100%")).get
    assert(pct.select("payload").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("pct"))
    // compaction keeps the layout
    t.compactPartitioned("country", 1L << 30)
    assert(t.partitionValuesString("country").toSet == hardValues.toSet)
    ()
  }

  test("replacePartitionsString swaps exactly the named string partitions") {
    val root = fresh("strrepl")
    val t = GraftTable.forPath(spark, root)
    t.appendPartitioned(hardDf, "country")
    val repl = Seq((999, "fresh", "South Africa"))
      .toDF("id", "payload", "country")
    t.replacePartitionsString(repl, "country", Seq("South Africa"))
    val sa = t.readPartitionedColumnString("country",
      Seq("South Africa")).get
    assert(sa.select("id").collect().map(_.getInt(0)).toSeq == Seq(999))
    // out-of-scope rows still refuse (the declared-scope contract)
    val e = intercept[IllegalArgumentException] {
      t.replacePartitionsString(
        Seq((1, "x", "India")).toDF("id", "payload", "country"),
        "country", Seq("South Africa"))
    }
    assert(e.getMessage.contains("outside the declared scope"))
    ()
  }

  test("partition key re-type and key mixing refuse; payload column cannot shadow a string key") {
    val root = fresh("strguard")
    val t = GraftTable.forPath(spark, root)
    t.appendPartitioned(hardDf, "country")
    // re-typing the key refuses (recorded partmeta is the contract)
    val retyped = Seq((1, "x", 7L)).toDF("id", "payload", "country")
    val e1 = intercept[IllegalArgumentException] {
      t.appendPartitioned(retyped, "country")
    }
    assert(e1.getMessage.contains("cannot re-type"), e1.getMessage)
    // partitioning the same table on another column refuses
    val other = Seq((1, "x", "y")).toDF("id", "country2", "payload")
    val e2 = intercept[IllegalArgumentException] {
      t.appendPartitioned(other, "country2")
    }
    assert(e2.getMessage.contains("hive-partitioned on 'country'"),
      e2.getMessage)
    // the colmap name-protection rule extends to string keys: a
    // payload column cannot take the partition column's name
    val e3 = intercept[IllegalArgumentException] {
      t.addColumn("country", org.apache.spark.sql.types.StringType)
    }
    assert(e3.getMessage.contains("partition column"), e3.getMessage)
    // unsupported partition types refuse loudly
    val e4 = intercept[IllegalArgumentException] {
      GraftTable.forPath(spark, fresh("strbad")).appendPartitioned(
        Seq((1, 1.5)).toDF("id", "w"), "w")
    }
    assert(e4.getMessage.contains("unsupported partition column type"))
    ()
  }

  test("subset readers read through the recorded physical schema (colmap + addColumn, ADVICE r12)") {
    val root = fresh("strcolmap")
    val t = GraftTable.forPath(spark, root)
    t.appendPartitioned(hardDf, "country")
    // rename a payload column (non-identity mapping), then WIDEN the
    // schema: pre-add files have no physical column for the new name.
    // Before the fix, readPartitions selected the missing physical
    // column and failed with an unresolved-column error (or read
    // nondeterministically under identity mapping).
    t.renameColumn("payload", "body")
    t.addColumn("note", org.apache.spark.sql.types.StringType)
    val one = t.readPartitionsString("country", Seq("India")).get
    assert(one.columns.toSeq == Seq("id", "body", "note"))
    assert(one.count() == 4)
    assert(one.filter(col("note").isNull).count() == 4) // null-filled
    val restored = t.readPartitionedColumnString("country",
      Seq("India")).get
    assert(restored.select("country").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("India"))
    ()
  }

  test("date-typed partition keys round-trip: land, convert-infer, restore, prune") {
    val root = fresh("datepart")
    val t = GraftTable.forPath(spark, root)
    val df = Seq(
      (1, java.sql.Date.valueOf("2026-08-01")),
      (2, java.sql.Date.valueOf("2026-08-01")),
      (3, java.sql.Date.valueOf("2026-08-15"))).toDF("id", "day")
    t.appendPartitioned(df, "day")
    assert(t.partMetaAt(1).map(_.tpe.catalogString) == Seq("date"))
    // date values are escape fixed points: plain value dirs on disk
    val dirs = new java.io.File(root, "data").listFiles()
      .flatMap(_.listFiles()).map(_.getName).filter(_.startsWith("day="))
    assert(dirs.toSet == Set("day=2026-08-01", "day=2026-08-15"), dirs.toSeq)
    // restore comes back as a real DATE column
    val one = t.readPartitionedColumnString("day", Seq("2026-08-01")).get
    assert(one.schema("day").dataType ==
      org.apache.spark.sql.types.DateType)
    assert(one.count() == 2)
    // DML referencing the date key restores + restages under dirs
    t.deleteWhere(col("day") === lit(java.sql.Date.valueOf("2026-08-01"))
      && col("id") === 1)
    assert(t.readPartitionedColumnString("day", Seq("2026-08-01")).get
      .select("id").collect().map(_.getInt(0)).toSeq == Seq(2))
    // CONVERT of a date-keyed plain layout infers... strings parse as
    // longs? no — dates are non-integral, inference says string; the
    // explicit PARTITIONED BY pins date (Delta's contract)
    val dir = fresh("datecv")
    df.write.partitionBy("day").parquet(dir)
    val t2 = GraftTable.convert(spark, dir,
      Seq("day" -> org.apache.spark.sql.types.DateType))
    assert(t2.partMetaAt(1).map(_.tpe.catalogString) == Seq("date"))
    assert(t2.readPartitionedColumnString("day", Seq("2026-08-15")).get
      .schema("day").dataType == org.apache.spark.sql.types.DateType)
    ()
  }

  test("null string partition values stage as the hive sentinel and restore as null") {
    val root = fresh("strnull")
    val t = GraftTable.forPath(spark, root)
    val df = Seq((1, Option("India")), (2, Option.empty[String]))
      .toDF("id", "country")
    t.appendPartitioned(df, "country")
    assert(t.partitionValuesString("country").toSeq ==
      Seq(null, "India"))
    val nulls = t.readPartitionedColumnString("country",
      Seq(GraftTable.HiveDefaultPartition)).get
    assert(nulls.select("id").collect().map(_.getInt(0)).toSeq == Seq(2))
    assert(nulls.filter(col("country").isNull).count() == 1)
    ()
  }

  test("per-partition manifest export serves string layouts in escaped dir form") {
    val root = fresh("strmani")
    val t = GraftTable.forPath(spark, root)
    t.appendPartitioned(hardDf, "country")
    val base = t.exportManifest()
    val dirs = new java.io.File(base).listFiles().map(_.getName).toSet
    assert(dirs.contains("country=a%3Db"), dirs.mkString(","))
    assert(dirs.contains("country=South Africa"))
    // each manifest's files really belong to its value dir
    val mf = new java.io.File(base, "country=a%3Db/manifest.txt")
    val listed = scala.io.Source.fromFile(mf).getLines().toSeq
    assert(listed.nonEmpty && listed.forall(_.contains("/country=a%3Db/")))
    ()
  }

  test("protocol row: monotone feature set, gates refuse on ACTIVE features only") {
    val root = fresh("proto")
    val t = GraftTable.create(spark, root,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
        .repartition(2))
    assert(t.protocolAt(t.latestVersion).isEmpty) // plain table
    t.deleteWhere(col("k") === 2L, mor = true)
    val vDv = t.latestVersion
    assert(t.protocolAt(vDv).contains("deletionVectors"))
    assert(t.activeReaderFeatures(vDv).contains("deletionVectors"))
    // raw path refuses in protocol vocabulary
    val e = intercept[Exception] {
      spark.read.format("graft").load(root).count()
    }
    assert(e.getMessage.contains("deletionVectors"), e.getMessage)
    assert(e.getMessage.contains("protocol"), e.getMessage)
    // purge deactivates the feature: protocol row KEEPS it (monotone,
    // Delta's rule) but the gate reopens because it checks ACTIVE state
    t.purge()
    val vP = t.latestVersion
    assert(t.protocolAt(vP).contains("deletionVectors"))
    assert(!t.activeReaderFeatures(vP).contains("deletionVectors"))
    assert(spark.read.format("graft").load(root).count() == 2)
    ()
  }

  test("DROP FEATURE: refused while active, allowed after deactivation; partmeta epochs clear correctly") {
    val root = fresh("dropfeat")
    val t = GraftTable.forPath(spark, root)
    t.appendPartitioned(hardDf, "country")                        // v1
    assert(t.protocolAt(1).contains("stringPartitionValues"))
    assert(t.activeReaderFeatures(1).contains("stringPartitionValues"))
    // active -> the drop refuses with the deactivation hint
    val e = intercept[IllegalArgumentException] {
      t.dropFeature("stringPartitionValues")
    }
    assert(e.getMessage.contains("still ACTIVE"), e.getMessage)
    // a FLAT overwrite ends the partitioned epoch: partmeta clears
    // (tombstone row), the feature goes inactive, protocol keeps it
    import spark.implicits._
    t.overwrite(Seq((1, "flat")).toDF("id", "payload"))           // v2
    assert(t.partMetaAt(2).isEmpty, "flat overwrite must clear partmeta")
    assert(t.partMetaAt(1).nonEmpty, "time travel still sees the row")
    assert(t.protocolAt(2).contains("stringPartitionValues"))
    assert(!t.activeReaderFeatures(2).contains("stringPartitionValues"))
    // now the SQL drop statement shrinks the protocol row
    val row = spark.sql(
      s"GRAFT DROP FEATURE stringPartitionValues FOR '$root'")
      .collect().head
    assert(!row.getString(1).contains("stringPartitionValues"))
    assert(!t.protocolAt(t.latestVersion)
      .contains("stringPartitionValues"))
    // unknown / never-enabled features refuse
    val e2 = intercept[IllegalArgumentException] {
      t.dropFeature("stringPartitionValues")
    }
    assert(e2.getMessage.contains("not in the protocol row"))
    // RESTORE back across the epoch re-establishes the row AS OF the
    // target version (and re-grows the protocol via the implied set)
    t.restore(1)
    assert(t.partMetaAt(t.latestVersion)
      .map(_.col) == Seq("country"))
    assert(t.protocolAt(t.latestVersion)
      .contains("stringPartitionValues"))
    assert(t.partitionValuesString("country").toSet == hardValues.toSet)
    ()
  }

  test("restoreTimestamp resolves through commit wall-clocks; SQL RESTORE statement routes both forms") {
    val root = fresh("restts")
    val t = GraftTable.create(spark, root, Seq((1, "a")).toDF("k", "v"))
    val ts1 = t.readCommit(1).tsMillis
    Thread.sleep(5)
    t.append(Seq((2, "b")).toDF("k", "v"))
    val v = t.restoreTimestamp(ts1) // newest commit at/before ts1 = v1
    assert(t.readCommit(v).action == "restore:1")
    assert(t.read().count() == 1)
    // unknown horizon refuses
    val e = intercept[IllegalArgumentException] {
      t.restoreTimestamp(ts1 - 1000000)
    }
    assert(e.getMessage.contains("no commit at or before"))
    // the SQL statement flavors
    val got = spark.sql(s"GRAFT RESTORE '$root' TO VERSION AS OF 2")
      .collect().head.getLong(0)
    assert(got == t.latestVersion && t.read().count() == 2)
    val ts2 = t.readCommit(2).tsMillis
    spark.sql(s"GRAFT RESTORE '$root' TO TIMESTAMP AS OF $ts1")
      .collect()
    assert(t.read().count() == 1)
    assert(ts2 >= ts1) // wall-clocks are monotone in the log
    ()
  }

  test("partmeta and protocol rows survive checkpointing and vacuum; flat append/adopt refuse on partitioned layouts") {
    // CheckpointEvery = 8: drive the table past a checkpoint, then
    // vacuum the pre-checkpoint commits away — the recorded partition
    // type and the protocol row must resolve from the CHECKPOINT
    // lines alone, or a vacuumed string-keyed table silently falls
    // back to the legacy integer contract
    val root = fresh("ckptmeta")
    val t = GraftTable.forPath(spark, root)
    t.appendPartitioned(hardDf, "country") // v1 records partmeta
    for (i <- 0 until 9) { // v2..v10 cross the v8 checkpoint
      t.appendPartitioned(
        Seq((1000 + i, s"extra_$i", "India"))
          .toDF("id", "payload", "country"), "country")
      ()
    }
    assert(t.latestVersion == 10L)
    t.vacuum(retainVersions = 2, orphanGraceMillis = 0L)
    val t2 = GraftTable.forPath(spark, root) // fresh instance, no caches
    assert(t2.versions().head > 1L, "vacuum kept the old commits")
    assert(t2.partMetaAt(t2.latestVersion)
      .map(p => (p.col, p.tpe.catalogString)) ==
      Seq(("country", "string")))
    assert(t2.protocolAt(t2.latestVersion)
      .contains("stringPartitionValues"))
    // restore still types the column correctly from the checkpointed
    // row: a DML referencing the key works post-vacuum
    t2.deleteWhere(col("country") === "India" && col("id") === 1000)
    assert(t2.readPartitionedColumnString("country", Seq("India")).get
      .filter(col("id") === 1000).count() == 0)
    // the flat-append soundness guard: files without value dirs would
    // be invisible to every pruned read — refuse loudly
    val e = intercept[IllegalArgumentException] {
      t2.append(Seq((1, "x")).toDF("id", "payload"))
    }
    assert(e.getMessage.contains("flat append"), e.getMessage)
    val stagedDir = fresh("adoptseg")
    Seq((2, "y")).toDF("id", "payload").write.parquet(stagedDir)
    val e2 = intercept[IllegalArgumentException] {
      t2.adoptDir(stagedDir)
    }
    assert(e2.getMessage.contains("FLAT segment"), e2.getMessage)
    ()
  }

  test("graft_partitions and graft_protocol TVFs introspect the new layers") {
    val root = fresh("tvfpart")
    val t = GraftTable.forPath(spark, root)
    t.appendPartitioned(hardDf, "country")
    val parts = spark.sql(s"SELECT * FROM graft_partitions('$root')")
      .collect()
    assert(parts.length == hardValues.length)
    assert(parts.forall(r => r.getString(0) == "country" &&
      r.getString(1) == "string" && r.getLong(3) >= 1L &&
      r.getLong(4) > 0L))
    assert(parts.map(_.getString(2)).toSet == hardValues.toSet)
    // flat tables: no rows
    val flat = fresh("tvfflat")
    import spark.implicits._
    GraftTable.create(spark, flat, Seq((1, "a")).toDF("k", "v"))
    assert(spark.sql(s"SELECT * FROM graft_partitions('$flat')")
      .count() == 0)
    // protocol TVF: recorded vs active
    val prot = spark.sql(s"SELECT * FROM graft_protocol('$root')")
      .collect().map(r => r.getString(0) -> ((r.getBoolean(1), r.getBoolean(2))))
      .toMap
    assert(prot("stringPartitionValues") == ((true, true)))
    t.overwrite(Seq((1, "flat")).toDF("id", "payload")) // deactivate
    val prot2 = spark.sql(s"SELECT * FROM graft_protocol('$root')")
      .collect().map(r => r.getString(0) -> ((r.getBoolean(1), r.getBoolean(2))))
      .toMap
    assert(prot2("stringPartitionValues") == ((true, false)))
    ()
  }

  test("GRAFT VACUUM RETAIN n HOURS maps the wall-clock window to a version horizon") {
    val root = fresh("vach")
    val t = GraftTable.create(spark, root, Seq((1, "a")).toDF("k", "v"))
    t.overwrite(Seq((2, "b")).toDF("k", "v"))
    t.overwrite(Seq((3, "c")).toDF("k", "v"))
    // everything committed milliseconds ago: a 1000-hour window keeps
    // every version — the dry run reclaims no commit files
    val rows = spark.sql(
      s"GRAFT VACUUM '$root' RETAIN 1000 HOURS DRY RUN").collect()
    assert(!rows.exists(_.getString(0) == "commit"),
      rows.mkString(","))
    assert(t.retainVersionsForHours(1000.0) == 3)
    // a zero-hour window keeps only the newest (never less than 1)
    assert(t.retainVersionsForHours(0.0) >= 1)
    ()
  }

  test("vacuumHours boundary: in-window commits survive, older reclaim, dry-run and execution agree (round 17)") {
    val root = fresh("vachb")
    val t = GraftTable.create(spark, root, Seq((1, "a")).toDF("k", "v"))
    t.overwrite(Seq((2, "b")).toDF("k", "v"))                      // v2
    Thread.sleep(1500) // age v1/v2 past the window boundary
    t.overwrite(Seq((3, "c")).toDF("k", "v"))                      // v3
    // window ≈ 1.08 s: v3 (just committed) is in-window, v1/v2 are
    // not — the boundary commit (the newest in-window one) is kept
    val hrs = 0.0003
    assert(t.retainVersionsForHours(hrs) == 1,
      s"expected only v3 in the ${hrs}h window")
    // dry-run / execution can't-disagree: execute EXACTLY the shown
    // plan (orphanGraceMillis=0 so the just-superseded files count)
    val plan = t.vacuumPlan(t.retainVersionsForHours(hrs), 0L)
    assert(plan.commits == Seq(1L, 2L),
      s"pre-horizon commits should reclaim, got ${plan.commits}")
    assert(plan.files.nonEmpty, "superseded files should reclaim")
    t.vacuumExecute(plan)
    // the surviving table serves exactly v3's content
    assert(t.read().collect().map(r => (r.getInt(0), r.getString(1)))
      .toSeq == Seq((3, "c")))
    // reclaimed commit files are gone; the horizon checkpoint serves
    assert(t.latestVersion == 3L)
    ()
  }

  // ---- multi-column partition keys (VERDICT r13 item 2) --------------

  private def twoKeyDf = {
    val rows = for {
      (c, i) <- Seq("India", "South Africa", "a=b").zipWithIndex
      src <- Seq("web", "s3://x", "api v2")
      j <- 0 until 3
    } yield (i * 100 + j, s"p_${c}_${src}_$j", c, src)
    rows.toDF("id", "payload", "country", "source")
  }

  test("two-key layouts: appendPartitioned(Seq) records the ordered list, escapes per segment, prunes on any key") {
    val root = fresh("twokey")
    val t = GraftTable.forPath(spark, root)
    t.appendPartitioned(twoKeyDf, Seq("country", "source"), null)
    // partmeta records BOTH keys, in nesting order
    assert(t.partMetaAt(1).map(p => (p.col, p.tpe.catalogString)) ==
      Seq(("country", "string"), ("source", "string")))
    assert(t.protocolAt(1).contains("stringPartitionValues"))
    // both levels' value dirs escape on disk ('a=b' outer, 's3://x'
    // and 'api v2' inner)
    val rels = t.liveFiles().map(_._1)
    assert(rels.exists(_.contains("/country=a%3Db/")), rels.take(3))
    assert(rels.exists(_.contains("/source=s3%3A%2F%2Fx/")), rels.take(3))
    // pruning works on EITHER key, and the read restores BOTH columns
    val byCountry = t.readPartitionedColumnString("country",
      Seq("South Africa")).get
    assert(byCountry.columns.toSet.contains("source"))
    assert(byCountry.count() == 9)
    assert(byCountry.select("source").distinct().collect()
      .map(_.getString(0)).toSet == Set("web", "s3://x", "api v2"))
    val bySource = t.readPartitionedColumnString("source",
      Seq("api v2")).get
    assert(bySource.count() == 9)
    assert(bySource.select("country").distinct().collect()
      .map(_.getString(0)).toSet == Set("India", "South Africa", "a=b"))
    // the inner-key prune opened only the matching files at the log
    assert(t.liveFiles().map(_._1)
      .count(p => ("/" + p).contains("/source=api%20v2/"))
      < t.liveFiles().size,
      "inner-key value dirs must subset the live files")
    ()
  }

  test("two-key DML restores ALL keys from paths and re-stages under the full value-dir chain") {
    val root = fresh("twokeydml")
    val t = GraftTable.forPath(spark, root)
    t.appendPartitioned(twoKeyDf, Seq("country", "source"), null)
    val before = multiset(t.readPartitionedColumnString("country",
      Seq("India", "South Africa", "a=b")).get)
    // predicate references BOTH keys — only restorable if DML
    // restores both columns
    t.deleteWhere(col("country") === "India" &&
      col("source") === "s3://x" && col("id") === 1)
    val after = t.readPartitionedColumnString("country",
      Seq("India", "South Africa", "a=b")).get
    assert(after.count() == before.values.sum - 1)
    // the rewritten survivors re-staged under BOTH value dirs:
    // an inner-key pruned read still finds them
    val slice = t.readPartitionedColumnString("source", Seq("s3://x")).get
      .filter(col("country") === "India")
    assert(slice.collect().map(_.getAs[Int]("id")).sorted.toSeq ==
      Seq(0, 2))
    // update referencing the inner key, restaged correctly
    t.update(col("source") === "api v2" && col("country") === "a=b",
      Map("payload" -> lit("patched")))
    val patched = t.readPartitionedColumnString("source", Seq("api v2"))
      .get.filter(col("country") === "a=b")
    assert(patched.collect().forall(_.getAs[String]("payload") == "patched"))
    // SET on ANY partition key refuses
    val e = intercept[IllegalArgumentException] {
      t.update(col("id") === 0, Map("source" -> lit("x")))
    }
    assert(e.getMessage.contains("partition column"), e.getMessage)
    ()
  }

  test("two-key CONVERT via SQL, mismatched order refuses pre-commit, manifest exports the chain") {
    val dir = fresh("twokeycv")
    twoKeyDf.write.partitionBy("country", "source").parquet(dir)
    // declared in the WRONG order: refuse, nothing committed
    val e = intercept[Exception] {
      spark.sql(
        s"GRAFT CONVERT '$dir' PARTITIONED BY (source string, country string)")
        .collect()
    }
    assert(e.getMessage.contains("declared PARTITIONED BY"), e.getMessage)
    assert(GraftTable.forPath(spark, dir).latestVersion == 0)
    spark.sql(
      s"GRAFT CONVERT '$dir' PARTITIONED BY (country string, source string)")
      .collect()
    val t = GraftTable.forPath(spark, dir)
    assert(t.partMetaAt(1).map(_.col) == Seq("country", "source"))
    // pruned read on the inner key of a CONVERTED layout
    assert(t.readPartitionedColumnString("source", Seq("web")).get
      .count() == 9)
    // manifest: one manifest per country=…/source=… chain
    val mf = t.exportManifest()
    val chains = new java.io.File(mf).listFiles().flatMap(c =>
      c.listFiles().map(sc => s"${c.getName}/${sc.getName}"))
    assert(chains.length == 9, chains.toSeq)
    assert(chains.forall(c =>
      c.startsWith("country=") && c.contains("/source=")), chains.toSeq)
    // graft_partitions: one row per (key, value) — 3 + 3 values
    val tvf = spark.sql(s"SELECT * FROM graft_partitions('$dir')")
      .collect()
    assert(tvf.map(_.getString(0)).toSet == Set("country", "source"))
    assert(tvf.length == 6, tvf.mkString(","))
    ()
  }

  test("flat append refuses on an EMPTIED partitioned table (recorded partmeta governs, ADVICE r13)") {
    val root = fresh("emptiedpart")
    val t = GraftTable.forPath(spark, root)
    t.appendPartitioned(Seq((1, "x", "IN")).toDF("id", "p", "c"),
      "c")                                                       // v1
    t.deleteWhere(lit(true))                                     // v2: empty
    assert(t.read().count() == 0)
    // live set is empty but the partmeta row still records the key:
    // a flat append would poison later pruned reads — refuse
    val e = intercept[IllegalArgumentException] {
      t.append(Seq((2, "y")).toDF("id", "p"))
    }
    assert(e.getMessage.contains("hive-partitioned"), e.getMessage)
    // the partitioned verb resumes the epoch fine
    t.appendPartitioned(Seq((3, "z", "ZA")).toDF("id", "p", "c"), "c")
    assert(t.readPartitionedColumnString("c", Seq("ZA")).get.count() == 1)
    // a flat OVERWRITE legitimately ends the epoch (tombstone), after
    // which flat appends work
    t.overwrite(Seq((4, "w")).toDF("id", "p"))
    assert(t.partMetaAt(t.latestVersion).isEmpty)
    t.append(Seq((5, "v")).toDF("id", "p"))
    assert(t.read().count() == 2)
    ()
  }

  test("null partition values serve as NULL through the log-backed DSv2 read and stream") {
    val root = fresh("nulldsv2")
    val t = GraftTable.forPath(spark, root)
    t.appendPartitioned(
      Seq((1, "a", "IN"), (2, "b", null), (3, "c", "ZA"))
        .toDF("id", "payload", "country"), "country")
    // the null row staged under the hive sentinel dir; the DSv2 read
    // must restore it as a real NULL, not the sentinel string
    val snap = spark.read.format("graft").load(root)
    assert(snap.filter(col("country").isNull).count() == 1)
    assert(snap.filter(col("country").isNull).head.getAs[Int]("id") == 2)
    assert(!snap.collect().exists(r =>
      Option(r.getAs[String]("country"))
        .exists(_.contains("HIVE_DEFAULT"))))
    // and filters on the restored column prune around it correctly
    assert(snap.filter(col("country") === "IN").count() == 1)
    ()
  }

  test("df.write.format(graft).partitionBy routes into the partitioned verbs (never a silent flat landing)") {
    val root = fresh("v1pb")
    val df1 = Seq((1, "x", "IN"), (2, "y", "ZA"))
      .toDF("id", "payload", "country")
    // first save CREATES the partitioned layout
    df1.write.format("graft").partitionBy("country").save(root)
    val t = GraftTable.forPath(spark, root)
    assert(t.partMetaAt(1).map(_.col) == Seq("country"),
      "partitionBy intent must be recorded, not dropped")
    assert(t.liveFiles().forall(_._1.contains("/country=")),
      t.liveFiles().map(_._1))
    // append mode stages under the SAME layout
    Seq((3, "z", "IN")).toDF("id", "payload", "country")
      .write.format("graft").partitionBy("country").mode("append")
      .save(root)
    assert(t.readPartitionedColumnString("country", Seq("IN")).get
      .count() == 2)
    // a FLAT append against the partitioned table still refuses:
    // payload-shaped (passes the v1 schema check, hits the guard) …
    val e = intercept[Exception] {
      Seq((4, "w")).toDF("id", "payload")
        .write.format("graft").mode("append").save(root)
    }
    assert(e.getMessage.contains("hive-partitioned"), e.getMessage)
    // … and full-shaped (the key as a data column): the schema gate
    // refuses before a flat landing can poison pruned reads
    val eFull = intercept[Exception] {
      Seq((4, "w", "IN")).toDF("id", "payload", "country")
        .write.format("graft").mode("append").save(root)
    }
    assert(eFull.getMessage.contains("schema mismatch"), eFull.getMessage)
    // a MISMATCHED key refuses through the verb's consistency gate
    val e2 = intercept[Exception] {
      Seq((5, "v", "IN")).toDF("id", "country", "payload")
        .write.format("graft").partitionBy("payload").mode("append")
        .save(root)
    }
    assert(e2.getMessage.contains("cannot stage a batch partitioned"),
      e2.getMessage)
    // overwrite replaces the whole layout (two-key this time)
    Seq((9, "o", "IN", 7L)).toDF("id", "payload", "country", "bucket")
      .write.format("graft").partitionBy("country", "bucket")
      .mode("overwrite").save(root)
    assert(t.partMetaAt(t.latestVersion).map(_.col) ==
      Seq("country", "bucket"))
    assert(spark.read.format("graft").load(root).columns.toSet ==
      Set("id", "payload", "country", "bucket"))
    ()
  }

  test("SQL UPDATE and DELETE route into the partitioned CoW verbs; predicates on restored keys work") {
    val root = fresh("sqlpartdml")
    val t = GraftTable.forPath(spark, root)
    t.appendPartitioned(
      Seq((1, "a", "India"), (2, "b", "India"), (3, "c", "a=b"))
        .toDF("id", "payload", "country"), "country")
    spark.conf.set("spark.sql.catalog.gsql",
      classOf[graft.sources.GraftCatalog].getName)
    // the catalog table's schema includes the restored key column
    val viaSql = spark.sql(s"SELECT * FROM gsql.`$root`")
    assert(viaSql.columns.toSet == Set("id", "payload", "country"))
    // SQL UPDATE with a predicate on the PATH-BORNE key
    spark.sql(
      s"UPDATE gsql.`$root` SET payload = 'patched' " +
        "WHERE country = 'India' AND id = 2")
    assert(t.readPartitionedColumnString("country", Seq("India")).get
      .filter(col("id") === 2).head.getAs[String]("payload") == "patched")
    // SQL DELETE keyed on the escaped-value partition
    spark.sql(s"DELETE FROM gsql.`$root` WHERE country = 'a=b'")
    assert(t.read().count() == 2)
    assert(t.readPartitionedColumnString("country", Seq("a=b")).isEmpty)
    // survivors still live under their value dirs (pruned read works)
    assert(t.readPartitionedColumnString("country", Seq("India")).get
      .count() == 2)
    // SET on the partition key refuses through SQL too
    val e = intercept[Exception] {
      spark.sql(s"UPDATE gsql.`$root` SET country = 'ZA' WHERE id = 1")
    }
    assert(e.getMessage.contains("partition column"), e.getMessage)
    ()
  }

  test("partition-scoped OPTIMIZE WHERE compacts only matching partitions, others stay byte-identical") {
    val root = fresh("optwhere")
    val t = GraftTable.forPath(spark, root)
    // fragment two partitions: 4 undersized files each
    val df = (0 until 32).map(i =>
      (i, s"pay_$i", if (i % 2 == 0) "hot" else "cold"))
      .toDF("id", "payload", "seg").repartition(4)
    t.appendPartitioned(df, "seg")
    val before = t.liveFiles().toMap
    val coldBefore = before.filter(f => ("/" + f._1).contains("/seg=cold/"))
    assert(coldBefore.size == 4)
    val v = spark.sql(
      s"GRAFT OPTIMIZE '$root' WHERE (seg = 'hot') TARGET ${1L << 20}")
      .collect().head.getLong(0)
    assert(v == 2L, s"scoped OPTIMIZE should commit v2, got v$v")
    val after = t.liveFiles().toMap
    // cold partition: exactly the same files, byte for byte
    assert(after.filter(f => ("/" + f._1).contains("/seg=cold/")) ==
      coldBefore, "non-matching partition files must stay untouched")
    // hot partition compacted to fewer files, content preserved
    val hotAfter = after.keySet.filter(p => ("/" + p).contains("/seg=hot/"))
    assert(hotAfter.size < 4, s"hot partition still has ${hotAfter.size}")
    assert(t.readPartitionedColumnString("seg", Seq("hot")).get
      .count() == 16)
    // IN-list form and no-op on an already-compacted scope
    val v2 = spark.sql(
      s"GRAFT OPTIMIZE '$root' WHERE (seg IN ('hot')) TARGET ${1L << 20}")
      .collect().head.getLong(0)
    assert(v2 == 2L, "no-op scoped OPTIMIZE must not commit")
    ()
  }

  test("OPTIMIZE WHERE values containing ',' or ')' scope correctly — quote-aware IN-list (round-16 ADVICE)") {
    val root = fresh("optwhereq")
    val t = GraftTable.forPath(spark, root)
    val df = (0 until 32).map(i =>
      (i, s"pay_$i", if (i % 2 == 0) "a,b" else "x)y"))
      .toDF("id", "payload", "seg").repartition(4)
    t.appendPartitioned(df, "seg")
    // a bare split(",") would tokenize 'a,b' into ['a, b'] and the
    // misread scope would silently no-op (no commit)
    val v = spark.sql(
      s"GRAFT OPTIMIZE '$root' WHERE (seg IN ('a,b')) TARGET ${1L << 20}")
      .collect().head.getLong(0)
    assert(v == 2L, "quoted-comma IN value must scope, not silently no-op")
    // a ')' inside a quoted equality value must not terminate the scope
    val v2 = spark.sql(
      s"GRAFT OPTIMIZE '$root' WHERE (seg = 'x)y') TARGET ${1L << 20}")
      .collect().head.getLong(0)
    assert(v2 == 3L, "quoted-paren value must scope, not silently no-op")
    assert(t.read().count() == 32)
    // unterminated quote refuses loudly, never a misread scope
    val e = intercept[Exception] {
      spark.sql(s"GRAFT OPTIMIZE '$root' WHERE (seg IN ('a,b)) TARGET 99")
    }
    assert(e.getMessage != null, s"expected loud refusal: $e")
    ()
  }

  test("two-key OPTIMIZE WHERE conjunction scopes to a single cell (round 15)") {
    val root = fresh("optwhere2k")
    val t = GraftTable.forPath(spark, root)
    // 2×2 cells, 4 undersized files each
    val df = (0 until 64).map(i =>
      (i, s"pay_$i", if (i % 2 == 0) "hot" else "cold", (i / 2) % 2))
      .toDF("id", "payload", "seg", "bucket").repartition(4)
    t.appendPartitioned(df, Seq("seg", "bucket"), null)
    val before = t.liveFiles().toMap
    val cellTok = "/seg=hot/bucket=1/"
    val others = before.filterNot(f => ("/" + f._1).contains(cellTok))
    val v = spark.sql(s"GRAFT OPTIMIZE '$root' WHERE " +
      s"(seg = 'hot' AND bucket = 1) TARGET ${1L << 20}")
      .collect().head.getLong(0)
    assert(v == 2L)
    val after = t.liveFiles().toMap
    assert(after.filterNot(f => ("/" + f._1).contains(cellTok)) == others,
      "a cell-scoped OPTIMIZE touched files outside the matched cell")
    val cellAfter = after.keySet.filter(p => ("/" + p).contains(cellTok))
    assert(cellAfter.size < 4 && cellAfter.nonEmpty,
      s"matched cell should compact, has ${cellAfter.size} files")
    // two-level restage intact: both keys still prune and restore
    assert(t.readPartitionedColumnString("bucket", Seq("1")).get
      .filter(col("seg") === "hot").count() == 16)
    ()
  }

  test("scoped OPTIMIZE ZORDER BY re-clusters only the matched partition (round 15)") {
    val root = fresh("optzw")
    val t = GraftTable.forPath(spark, root)
    // payload carries two scan dimensions; files land arrival-ordered
    val df = (0 until 4096).map { i =>
      val x = (i * 769) % 1024; val y = (i * 257) % 1024
      (x.toLong, y.toLong, s"p_$i", if (i % 2 == 0) "hot" else "cold")
    }.toDF("x", "y", "payload", "seg").repartition(8)
    t.appendPartitioned(df, "seg")
    val before = t.liveFiles().toMap
    val coldBefore = before.filter(f => ("/" + f._1).contains("/seg=cold/"))
    val contentBefore = multiset(
      t.readPartitionedColumnString("seg", Seq("hot", "cold")).get)
    val v = spark.sql(s"GRAFT OPTIMIZE '$root' WHERE (seg = 'hot') " +
      "ZORDER BY (x, y) FILES 4").collect().head.getLong(0)
    assert(v == 2L)
    val after = t.liveFiles().toMap
    // cold: byte-identical; hot: every file rewritten, z-range-split
    assert(after.filter(f => ("/" + f._1).contains("/seg=cold/")) ==
      coldBefore, "scoped zorder touched the unmatched partition")
    val hotAfter = after.keySet.filter(p => ("/" + p).contains("/seg=hot/"))
    assert(hotAfter.size == 4, s"FILES 4 should land 4 files: $hotAfter")
    assert(hotAfter.forall(p => !before.contains(p)),
      "scoped zorder must rewrite every matched file")
    // content-neutral, keys restored
    assert(multiset(t.readPartitionedColumnString("seg",
      Seq("hot", "cold")).get) == contentBefore)
    // the layout did what z-order promises INSIDE the cell: each
    // rewritten file covers a compact rectangle, so per-file x-spans
    // shrink vs the arrival-ordered landing (which spanned ~everything)
    def spans(paths: Iterable[String]) = paths.toSeq.map { p =>
      val r = spark.read.parquet(s"$root/$p").agg(min("x"), max("x")).head
      r.getLong(1) - r.getLong(0)
    }
    val hotBefore = before.keySet.filter(p => ("/" + p).contains("/seg=hot/"))
    assert(spans(hotAfter).sum < spans(hotBefore).sum,
      "z-ordered files should cover tighter x-ranges than arrival order")
    ()
  }

  test("OPTIMIZE WHERE grammar refusals are loud and specific (round 15)") {
    val root = fresh("optref")
    val t = GraftTable.forPath(spark, root)
    t.appendPartitioned(
      (0 until 8).map(i => (i, i.toLong, "s" + (i % 2)))
        .toDF("id", "x", "seg"), "seg")
    def msg(sql: String): String =
      intercept[Exception](spark.sql(sql)).getMessage
    assert(msg(s"GRAFT OPTIMIZE '$root' WHERE (seg = 's0') " +
      "ZORDER BY (id, x) TARGET 100").contains("FILES n, not TARGET"))
    assert(msg(s"GRAFT OPTIMIZE '$root' WHERE (seg = 's0') FILES 4")
      .contains("TARGET n (bytes), not FILES"))
    assert(msg(s"GRAFT OPTIMIZE '$root' WHERE (seg = 's0' AND AND x = 1) " +
      "TARGET 100").contains("cannot parse scope"))
    // z-order dims must be payload columns
    val e = intercept[IllegalArgumentException] {
      t.zorderPartitions(Seq("seg" -> Seq("s0")), "seg", "x", 4)
    }
    assert(e.getMessage.contains("payload columns"), e.getMessage)
    // scope column must be a layout key
    val e2 = intercept[IllegalArgumentException] {
      t.compactPartitionsWhere(Seq("nope" -> Seq("1")), 1L << 20)
    }
    assert(e2.getMessage.contains("not a partition column"), e2.getMessage)
    ()
  }
}
