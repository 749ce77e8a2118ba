package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.GraftTable
import java.nio.file.Files

/** Dynamic partition overwrite + `replaceWhere` (round-15 verdict
  * item 2) — the daily-backfill verbs: restate exactly the partitions
  * a predicate (or the incoming batch itself) addresses, in ONE
  * serializable 'replace' commit, with every untouched partition's
  * live files BYTE-IDENTICAL afterwards (same relpaths, same sizes —
  * never read, rewritten, or restaged).
  */
class GraftReplaceWhereSpec extends SparkSpec {

  private def multiset(df: DataFrame) =
    df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap

  private def freshRoot(tag: String) =
    Files.createTempDirectory(tag).toString + "/t"

  /** The serving read: the DSv2 snapshot scan, which restores the
    * partition columns through the log-backed file index.
    */
  private def serve(root: String): DataFrame =
    spark.read.format("graft").load(root)

  /** (relpath, bytes) of the live set — the byte-identity witness. */
  private def live(t: GraftTable): Set[(String, Long)] =
    t.liveFileMeta().map(f => (f._1, f._2)).toSet

  private def seg(status: String, n: Int, price: Double) = {
    import spark.implicits._
    (1 to n).map(i => (s"${status}_$i", price, status))
      .toDF("okey", "price", "status")
  }

  test("replaceWhere restates exactly the matched partition; untouched partitions' files stay byte-identical") {
    val root = freshRoot("graft_rw")
    val t = GraftTable.forPath(spark, root)
    t.appendPartitioned(
      seg("F", 5, 10.0).unionByName(seg("O", 4, 20.0))
        .unionByName(seg("P", 3, 30.0)), "status")            // v1
    val before = live(t)
    val untouched = before.filterNot(_._1.contains("/status=F/"))
    val restated = seg("F", 2, 99.0)
    val v = t.replaceWhere(col("status") === "F", restated)
    assert(v.contains(2L))
    val after = live(t)
    // every non-matched live file survived EXACTLY (path + bytes)
    assert(untouched.subsetOf(after),
      "replaceWhere restaged files of partitions the predicate never matched")
    // no old F file survived
    assert(!after.exists(f => before.contains(f) &&
      f._1.contains("/status=F/")),
      "replaceWhere left the replaced partition's old files live")
    assert(multiset(serve(root)) == multiset(
      restated.unionByName(seg("O", 4, 20.0)).unionByName(seg("P", 3, 30.0))))
    ()
  }

  test("replaceWhere refuses rows violating the predicate and lands new chains") {
    val root = freshRoot("graft_rw_ref")
    val t = GraftTable.forPath(spark, root)
    t.appendPartitioned(seg("F", 3, 10.0), "status")          // v1
    // rows outside the declared scope: refused BEFORE staging
    val e1 = intercept[IllegalArgumentException] {
      t.replaceWhere(col("status") === "F",
        seg("F", 1, 1.0).unionByName(seg("O", 1, 1.0)))
    }
    assert(e1.getMessage.contains("violating the predicate"), e1.getMessage)
    assert(t.latestVersion == 1L, "a refused replace must commit nothing")
    // a predicate matching NO live chain introduces the partition:
    // nothing removed, the batch lands (backfill of a new period)
    val before = live(t)
    t.replaceWhere(col("status") === "Z", seg("Z", 2, 7.0))   // v2
    assert(before.subsetOf(live(t)))
    assert(multiset(serve(root)) ==
      multiset(seg("F", 3, 10.0).unionByName(seg("Z", 2, 7.0))))
    ()
  }

  test("arbitrary replaceWhere (payload predicate): row-level CoW on flat AND partitioned tables") {
    import spark.implicits._
    // FLAT table: restate a key range atomically — no layout needed
    val root = freshRoot("graft_rw_rows")
    val t = GraftTable.forPath(spark, root)
    val base = (1 to 40).map(i => (i.toLong, i * 10.0)).toDF("k", "price")
    GraftTable.create(spark, root,
      base.repartitionByRange(4, col("k")))                   // v1: 4 files
    val before = live(t)
    val restated = (11 to 20).map(i => (i.toLong, 999.0)).toDF("k", "price")
    val v = t.replaceWhere(col("k").between(11, 20), restated) // v2
    assert(v.contains(2L))
    // range-staged files outside [11,20] are stats-pruned: never read,
    // never rewritten — byte-identical
    val untouchedAfter = live(t).intersect(before)
    assert(untouchedAfter.nonEmpty,
      "stats pruning should spare at least the far-range files")
    assert(multiset(serve(root)) == multiset(
      base.filter(!col("k").between(11, 20)).unionByName(restated)))
    // violating rows refuse in the row-level regime too
    val e = intercept[IllegalArgumentException] {
      t.replaceWhere(col("k") < 5, restated)
    }
    assert(e.getMessage.contains("violating the predicate"), e.getMessage)
    // PARTITIONED table, payload predicate: matched rows rewrite
    // ACROSS partitions, survivors restage under their value dirs
    val root2 = freshRoot("graft_rw_rows_p")
    val t2 = GraftTable.forPath(spark, root2)
    t2.appendPartitioned(
      seg("F", 4, 10.0).unionByName(seg("O", 4, 50.0))
        .unionByName(seg("F", 2, 50.0).withColumn("okey",
          concat(lit("hi_"), col("okey")))), "status")        // v1
    val newRows = Seq(("r1", 50.0, "F"), ("r2", 50.0, "O"))
      .toDF("okey", "price", "status")
    t2.replaceWhere(col("price") === 50.0, newRows)           // v2
    assert(multiset(serve(root2)) == multiset(
      seg("F", 4, 10.0).unionByName(newRows)))
    // pruned reads on the restaged survivors still work
    assert(t2.readPartitionedColumnString("status", Seq("F")).get
      .count() == 5)
    ()
  }

  test("replaceWhere addresses a single CELL of a two-key layout; every other cell stays byte-identical") {
    import spark.implicits._
    val root = freshRoot("graft_rw_2k")
    val t = GraftTable.forPath(spark, root)
    def cell(st: String, yr: String, n: Int, price: Double) =
      (1 to n).map(i => (s"${st}_${yr}_$i", price, st,
        java.sql.Date.valueOf(yr))).toDF("okey", "price", "ostatus", "oyear")
    val land = cell("F", "1996-01-01", 3, 10.0)
      .unionByName(cell("F", "1997-01-01", 2, 11.0))
      .unionByName(cell("O", "1996-01-01", 4, 12.0))
    t.appendPartitioned(land, Seq("ostatus", "oyear"), null)  // v1
    val before = live(t)
    val cellTok = "/ostatus=F/oyear=1996-01-01/"
    val others = before.filterNot(_._1.contains(cellTok))
    // the conjunction addresses ONE (outer, inner) cell — the shape
    // single-key replacePartitions cannot express (r14 verdict item 6)
    t.replaceWhere(
      col("ostatus") === "F" &&
        col("oyear") === lit("1996-01-01").cast("date"),
      cell("F", "1996-01-01", 1, 99.0))                       // v2
    val after = live(t)
    assert(others.subsetOf(after),
      "a cell-scoped replace restaged files outside the matched cell")
    assert(!after.exists(f => before.contains(f) && f._1.contains(cellTok)))
    assert(multiset(serve(root)) == multiset(
      cell("F", "1996-01-01", 1, 99.0)
        .unionByName(cell("F", "1997-01-01", 2, 11.0))
        .unionByName(cell("O", "1996-01-01", 4, 12.0))))
    // a RANGE predicate on the typed inner key spans cells: both
    // 1996 cells replace, the 1997 cell survives byte-identical
    val keep97 = live(t).filter(_._1.contains("/oyear=1997-01-01/"))
    t.replaceWhere(col("oyear") < lit("1997-01-01").cast("date"),
      cell("F", "1996-01-01", 1, 50.0)
        .unionByName(cell("O", "1996-01-01", 1, 51.0)))       // v3
    assert(keep97.subsetOf(live(t)))
    assert(multiset(serve(root)) == multiset(
      cell("F", "1996-01-01", 1, 50.0)
        .unionByName(cell("O", "1996-01-01", 1, 51.0))
        .unionByName(cell("F", "1997-01-01", 2, 11.0))))
    ()
  }

  test("overwritePartitionsDynamic replaces exactly the incoming chains") {
    val root = freshRoot("graft_dyn")
    val t = GraftTable.forPath(spark, root)
    t.appendPartitioned(
      seg("F", 3, 10.0).unionByName(seg("O", 2, 20.0)), "status") // v1
    val before = live(t)
    val oFiles = before.filter(_._1.contains("/status=O/"))
    // the batch carries F rows and a NEW status Z: F's chain replaces,
    // Z's lands fresh, O — absent from the batch — is untouched
    t.overwritePartitionsDynamic(
      seg("F", 1, 77.0).unionByName(seg("Z", 2, 88.0)))       // v2
    val after = live(t)
    assert(oFiles.subsetOf(after),
      "dynamic overwrite touched a partition absent from the batch")
    assert(!after.exists(f => before.contains(f) &&
      f._1.contains("/status=F/")))
    assert(multiset(serve(root)) == multiset(
      seg("F", 1, 77.0).unionByName(seg("O", 2, 20.0))
        .unionByName(seg("Z", 2, 88.0))))
    // replay idempotence rides the same tag ledger as every verb
    assert(t.overwritePartitionsDynamic(seg("F", 1, 1.0), tag = "b1")
      .isDefined)                                             // v3
    assert(t.overwritePartitionsDynamic(seg("F", 9, 9.0), tag = "b1")
      .isEmpty, "a replayed tag must no-op")
    ()
  }

  test("df.write options: replaceWhere and partitionOverwriteMode=dynamic scope the v1 overwrite") {
    val root = freshRoot("graft_rw_v1")
    val t = GraftTable.forPath(spark, root)
    t.appendPartitioned(
      seg("F", 3, 10.0).unionByName(seg("O", 2, 20.0)), "status") // v1
    val oFiles = live(t).filter(_._1.contains("/status=O/"))
    // Delta's writer surface: scoped overwrite by predicate
    seg("F", 1, 42.0).write.format("graft").mode("overwrite")
      .option("replaceWhere", "status = 'F'").save(root)          // v2
    assert(oFiles.subsetOf(live(t)))
    assert(multiset(serve(root)) == multiset(
      seg("F", 1, 42.0).unionByName(seg("O", 2, 20.0))))
    // ...and by the incoming batch's own chains
    seg("O", 1, 43.0).write.format("graft").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").save(root)     // v3
    assert(multiset(serve(root)) == multiset(
      seg("F", 1, 42.0).unionByName(seg("O", 1, 43.0))))
    // scoping options on a non-overwrite mode: loud refusal, and the
    // two scoping forms are mutually exclusive
    val e = intercept[Exception] {
      seg("F", 1, 1.0).write.format("graft").mode("append")
        .option("replaceWhere", "status = 'F'").save(root)
    }
    assert(e.getMessage.contains("mode(\"overwrite\")"), e.getMessage)
    val e2 = intercept[Exception] {
      seg("F", 1, 1.0).write.format("graft").mode("overwrite")
        .option("replaceWhere", "status = 'F'")
        .option("partitionOverwriteMode", "dynamic").save(root)
    }
    assert(e2.getMessage.contains("mutually"), e2.getMessage)
    ()
  }

  test("GRAFT REPLACE INTO ... WHERE ... AS SELECT is the statement form of replaceWhere") {
    val root = freshRoot("graft_rw_sql")
    val t = GraftTable.forPath(spark, root)
    t.appendPartitioned(
      seg("F", 3, 10.0).unionByName(seg("O", 2, 20.0)), "status") // v1
    val oFiles = live(t).filter(_._1.contains("/status=O/"))
    seg("F", 2, 55.0).createOrReplaceTempView("rwsql_src")
    val v = spark.sql(s"GRAFT REPLACE INTO '$root' WHERE " +
      "(status = 'F') AS SELECT * FROM rwsql_src")
      .collect().head.getLong(0)
    assert(v == 2L)
    assert(oFiles.subsetOf(live(t)),
      "the statement form restaged unmatched partitions")
    assert(multiset(serve(root)) == multiset(
      seg("F", 2, 55.0).unionByName(seg("O", 2, 20.0))))
    // the verb's refusals surface through the statement too
    seg("O", 1, 1.0).createOrReplaceTempView("rwsql_bad")
    val e = intercept[Exception] {
      spark.sql(s"GRAFT REPLACE INTO '$root' WHERE (status = 'F') " +
        "AS SELECT * FROM rwsql_bad")
    }
    assert(e.getMessage.contains("violating the predicate"), e.getMessage)
    ()
  }

  test("streaming across a replace commit refuses (rewritten rows are not new); startingVersion resumes past it") {
    val root = freshRoot("graft_rw_stream")
    val t = GraftTable.forPath(spark, root)
    t.appendPartitioned(seg("F", 3, 10.0), "status")          // v1
    t.replaceWhere(col("status") === "F", seg("F", 2, 9.0))   // v2: replace
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("graft").load(root)
        .writeStream
        .option("checkpointLocation",
          Files.createTempDirectory("rw_stream_ck").toString)
        .format("noop").start()
      try q.processAllAvailable() finally q.stop()
    }
    def chain(x: Throwable): Seq[String] =
      if (x == null) Seq.empty
      else Option(x.getMessage).toSeq ++ chain(x.getCause)
    assert(chain(e).exists(_.contains("non-append")), chain(e).mkString("|"))
    // a tail stream past the replace serves only post-replace appends
    val out = freshDir("rw_stream_out")
    t.appendPartitioned(seg("Z", 2, 1.0), "status")           // v3
    val q2 = spark.readStream.format("graft")
      .option("startingVersion", "2").load(root)
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("rw_stream_ck2").toString)
      .foreachBatch { (b: DataFrame, id: Long) =>
        b.write.mode("overwrite").parquet(s"$out/b$id")
        ()
      }.start()
    try q2.processAllAvailable() finally q2.stop()
    assert(multiset(spark.read.parquet(s"$out/b0")) ==
      multiset(seg("Z", 2, 1.0)))
    ()
  }

  private def freshDir(tag: String) =
    Files.createTempDirectory(tag).toString

  test("vacuum reclaims a replaced partition's old files; replaceWhere is serializable against concurrent commits") {
    val root = freshRoot("graft_rw_vac")
    val t = GraftTable.forPath(spark, root)
    t.appendPartitioned(
      seg("F", 3, 10.0).unionByName(seg("O", 2, 20.0)), "status") // v1
    val oldF = live(t).filter(_._1.contains("/status=F/")).map(_._1)
    t.replaceWhere(col("status") === "F", seg("F", 1, 9.0))       // v2
    // the replaced files are logical removes — still on disk for time
    // travel until vacuum's horizon passes them
    assert(oldF.forall(p => new java.io.File(s"$root/$p").exists()))
    // zero grace: the statement form keeps the verb's 10-minute
    // in-flight-writer protection, which would (correctly) spare
    // these seconds-old files — the verb takes the override
    t.vacuum(retainVersions = 1, orphanGraceMillis = 0L)
    assert(oldF.forall(p => !new java.io.File(s"$root/$p").exists()),
      "vacuum must reclaim the replaced partition's unreferenced files")
    assert(multiset(serve(root)) == multiset(
      seg("F", 1, 9.0).unionByName(seg("O", 2, 20.0))))
    // serializability: a commit landing between the replace's snapshot
    // and its publish is a write conflict — the replace must abort,
    // not silently drop the interloper's files from its remove set
    val t2 = GraftTable.forPath(spark, root)
    val racing = new Thread(() => { t2.append(seg("O", 1, 30.0)); () })
    // deterministic interleave: land the conflicting commit FIRST,
    // then attempt a replace based on the stale snapshot via a fresh
    // handle pinned before the append
    val stale = GraftTable.forPath(spark, root)
    stale.latestVersion // resolve the pre-append snapshot
    racing.start(); racing.join()
    // the replace re-reads latestVersion at entry, so to provoke the
    // conflict we race two replaces: the second one's basedOn is stale
    // by the time the first publishes
    val a = new java.util.concurrent.atomic.AtomicInteger(0)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = (1 to 2).map(i => new Thread(() => {
      try { t.replaceWhere(col("status") === "F", seg("F", 1, i.toDouble))
            a.incrementAndGet(); () }
      catch { case e: Throwable => errs.add(e); () }
    }))
    ts.foreach(_.start()); ts.foreach(_.join())
    // at least one must win; a loser (if any) must be a loud conflict,
    // never a silent half-applied replace
    assert(a.get() >= 1)
    errs.forEach(e => assert(
      (e.getMessage != null && (e.getMessage.contains("conflict") ||
        e.getMessage.contains("concurrent"))) || a.get() == 2,
      s"unexpected failure shape: $e"))
    assert(serve(root).filter(col("status") === "F").count() == 1,
      "exactly one replace outcome must be visible")
    ()
  }

  test("row-level replaceWhere and deleteWhere KEEP rows whose predicate evaluates NULL (round-16 ADVICE)") {
    import spark.implicits._
    // one file holding a matching row AND null-predicate rows: a bare
    // !pred survivor filter would silently DROP the nulls in the CoW
    // rewrite (three-valued logic); Delta keeps them via
    // Not(EqualNullSafe(cond, true))
    def mixed = Seq(("a", Option(50.0)), ("b", Option.empty[Double]),
      ("c", Option(10.0)), ("d", Option.empty[Double]))
      .toDF("okey", "price").coalesce(1)
    val root1 = freshRoot("graft_rw_null")
    val t1 = GraftTable.forPath(spark, root1)
    t1.append(mixed)                                          // v1
    t1.replaceWhere(col("price") === 50.0,
      Seq(("a2", Option(50.0))).toDF("okey", "price"))        // v2
    assert(multiset(serve(root1)) == multiset(
      Seq(("a2", Option(50.0)), ("b", Option.empty[Double]),
        ("c", Option(10.0)), ("d", Option.empty[Double]))
        .toDF("okey", "price")),
      "row-level replaceWhere dropped null-predicate survivors")
    val root2 = freshRoot("graft_del_null")
    val t2 = GraftTable.forPath(spark, root2)
    t2.append(mixed)                                          // v1
    t2.deleteWhere(col("price") === 50.0)                     // v2
    assert(multiset(serve(root2)) == multiset(
      Seq(("b", Option.empty[Double]), ("c", Option(10.0)),
        ("d", Option.empty[Double])).toDF("okey", "price")),
      "deleteWhere dropped null-predicate survivors")
    ()
  }

  test("df.write scoped overwrite of a nonexistent table refuses loudly instead of hitting an empty log") {
    val root = freshRoot("graft_rw_nx")
    val e = intercept[Exception] {
      seg("F", 1, 1.0).write.format("graft").mode("overwrite")
        .option("replaceWhere", "status = 'F'").save(root)
    }
    assert(e.getMessage != null && e.getMessage.contains("no graft table"),
      s"wrong refusal shape: $e")
    val e2 = intercept[Exception] {
      seg("F", 1, 1.0).write.format("graft").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic").save(root)
    }
    assert(e2.getMessage != null && e2.getMessage.contains("no graft table"),
      s"wrong refusal shape: $e2")
    // nothing half-created
    assert(GraftTable.forPath(spark, root).latestVersion == 0L)
    ()
  }

  test("replaceWhere cdfImages: delete+insert images serve the feed across a backfill; replay reconstructs the table (round 16)") {
    import org.apache.spark.sql.Row
    val root = freshRoot("graft_rw_cdf")
    val t = GraftTable.forPath(spark, root)
    t.appendPartitioned(
      seg("F", 3, 10.0).unionByName(seg("O", 2, 20.0)), "status") // v1
    val pre = multiset(serve(root))
    val restated = seg("F", 2, 99.0)
    t.replaceWhere(col("status") === "F", restated,
      cdfImages = true)                                           // v2
    // the feed serves the replace range instead of refusing
    val feed = t.changeFeed(1, 2).get
    val dels = feed.filter(col("_change_type") === "delete")
      .drop("_change_type", "_commit_version")
    val ins = feed.filter(col("_change_type") === "insert")
      .drop("_change_type", "_commit_version")
    assert(multiset(dels) == multiset(seg("F", 3, 10.0)),
      "delete images must be exactly the replaced partition's rows")
    assert(multiset(ins) == multiset(restated))
    // replay: pre − deletes + inserts ≡ the post-replace table
    def minus(a: Map[Seq[Any], Int], b: Map[Seq[Any], Int]) =
      (a.keySet ++ b.keySet).map(k =>
        k -> (a.getOrElse(k, 0) - b.getOrElse(k, 0)))
        .filter(_._2 != 0).toMap
    def plus(a: Map[Seq[Any], Int], b: Map[Seq[Any], Int]) =
      (a.keySet ++ b.keySet).map(k =>
        k -> (a.getOrElse(k, 0) + b.getOrElse(k, 0)))
        .filter(_._2 != 0).toMap
    assert(plus(minus(pre, multiset(dels)), multiset(ins)) ==
      multiset(serve(root)),
      "feed replay across the backfill must reconstruct the table")
    // dynamic overwrite takes the same image rule
    val restated2 = seg("O", 1, 77.0)
    t.overwritePartitionsDynamic(restated2, cdfImages = true)     // v3
    val feed2 = t.changeFeed(2, 3).get
    assert(multiset(feed2.filter(col("_change_type") === "delete")
      .drop("_change_type", "_commit_version")) ==
      multiset(seg("O", 2, 20.0)))
    assert(multiset(feed2.filter(col("_change_type") === "insert")
      .drop("_change_type", "_commit_version")) == multiset(restated2))
    // row-level regime (payload predicate) stages images too
    val root2 = freshRoot("graft_rw_cdf_row")
    val t2 = GraftTable.forPath(spark, root2)
    t2.append(seg("F", 3, 10.0).drop("status"))                   // v1 flat
    t2.replaceWhere(col("price") === 10.0,
      seg("F", 1, 10.0).drop("status"), cdfImages = true)         // v2
    val f2 = t2.changeFeed(1, 2).get
    assert(f2.filter(col("_change_type") === "delete").count() == 3 &&
      f2.filter(col("_change_type") === "insert").count() == 1)
    // a replace WITHOUT images still refuses — the feed never lies
    t2.replaceWhere(col("price") === 10.0,
      seg("F", 1, 10.0).drop("status"))                           // v3
    val e = intercept[IllegalStateException](t2.changeFeed(2, 3))
    assert(e.getMessage.contains("whole-scope"), e.getMessage)
    ()
  }

  test("the CDF stream serves across an image-carrying replace commit (round 16)") {
    import org.apache.spark.sql.DataFrame
    val root = freshRoot("graft_rw_cdfs")
    val t = GraftTable.forPath(spark, root)
    t.appendPartitioned(
      seg("F", 3, 10.0).unionByName(seg("O", 2, 20.0)), "status") // v1
    t.replaceWhere(col("status") === "F", seg("F", 2, 99.0),
      cdfImages = true)                                           // v2
    val out = java.nio.file.Files
      .createTempDirectory("graft_rw_cdfs_out").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_rw_cdfs_ck").toString
    def drain(): Unit = {
      val q = spark.readStream.format("graft")
        .option("readChangeFeed", "true").load(root)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, id: Long) =>
          b.write.mode("overwrite").parquet(s"$out/b$id"); ()
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    drain()
    val streamed = spark.read.parquet(
      new java.io.File(out).listFiles.map(_.toString).toIndexedSeq: _*)
    assert(multiset(streamed) == multiset(
      t.changeFeed(0).get.select(streamed.columns.map(col).toIndexedSeq: _*)),
      "the CDF stream across the replace must equal the batch feed")
    ()
  }

  test("SQL INSERT OVERWRITE honors partitionOverwriteMode: dynamic replaces incoming chains, static replaces the set") {
    val root = freshRoot("graft_dyn_sql")
    spark.conf.set("spark.sql.catalog.grw",
      classOf[graft.sources.GraftCatalog].getName)
    spark.sql(s"CREATE TABLE grw.`$root` (okey STRING, price DOUBLE, " +
      "status STRING) PARTITIONED BY (status)")               // v1
    seg("F", 3, 10.0).unionByName(seg("O", 2, 20.0))
      .createOrReplaceTempView("rw_src1")
    spark.sql(s"INSERT INTO grw.`$root` SELECT * FROM rw_src1") // v2
    val t = GraftTable.forPath(spark, root)
    val before = live(t)
    val oFiles = before.filter(_._1.contains("/status=O/"))
    seg("F", 1, 70.0).createOrReplaceTempView("rw_src2")
    val mode = "spark.sql.sources.partitionOverwriteMode"
    val saved = spark.conf.get(mode)
    try {
      spark.conf.set(mode, "dynamic")
      spark.sql(s"INSERT OVERWRITE grw.`$root` SELECT * FROM rw_src2") // v3
      assert(oFiles.subsetOf(live(t)),
        "dynamic INSERT OVERWRITE replaced a partition absent from the batch")
      assert(multiset(spark.sql(s"SELECT * FROM grw.`$root`")) ==
        multiset(seg("F", 1, 70.0).unionByName(seg("O", 2, 20.0))))
      // static mode (the default) stays a whole-set replace
      spark.conf.set(mode, "static")
      spark.sql(s"INSERT OVERWRITE grw.`$root` SELECT * FROM rw_src2") // v4
      assert(multiset(spark.sql(s"SELECT * FROM grw.`$root`")) ==
        multiset(seg("F", 1, 70.0)))
    } finally spark.conf.set(mode, saved)
    ()
  }

  test("replaceWhere(mergeSchema) refuses tombstoned names: a dropped column must not resurrect from untouched files (ADVICE r17)") {
    import spark.implicits._
    // row-level regime on a flat table: drop `note`, then try to
    // re-add it through an evolved replace. The survivors and the
    // batch would stage the new column under the identity physical
    // name — but untouched OLD files still carry the dropped data
    // under that very name, so the snapshot read would resurrect it.
    val root = freshRoot("graft_rw_tomb")
    val t = GraftTable.create(spark, root, Seq(
      (1L, 10.0, "secret-a"), (2L, 20.0, "secret-b"),
      (50L, 500.0, "secret-c"))
      .toDF("id", "price", "note").repartitionByRange(2, col("id"))) // v1
    t.dropColumn("note")                                             // v2
    val batch = Seq((1L, 11.0, "fresh")).toDF("id", "price", "note")
    val e = intercept[IllegalArgumentException] {
      t.replaceWhere(col("id") === 1L, batch, mergeSchema = true)
    }
    assert(e.getMessage.contains("tombstoned"))
    // chain regime on a partitioned table: same refusal
    val root2 = freshRoot("graft_rw_tomb_p")
    val t2 = GraftTable.forPath(spark, root2)
    t2.appendPartitioned(Seq(
      (1L, 10.0, "x", "F"), (2L, 20.0, "y", "O"))
      .toDF("id", "price", "note", "status"), "status")              // v1
    t2.dropColumn("note")                                            // v2
    val e2 = intercept[IllegalArgumentException] {
      t2.replaceWhere(col("status") === "F",
        Seq((9L, 90.0, "z", "F")).toDF("id", "price", "note", "status"),
        mergeSchema = true)
    }
    assert(e2.getMessage.contains("tombstoned"))
    // both tables untouched by the refusals; a clean evolved replace
    // with a FRESH name still lands
    assert(t.latestVersion == 2L && t2.latestVersion == 2L)
    t.replaceWhere(col("id") === 1L,
      Seq((1L, 11.0, "fresh")).toDF("id", "price", "remark"),
      mergeSchema = true)                                            // v3
    assert(multiset(t.read()) == multiset(Seq(
      (1L, 11.0, Option("fresh")), (2L, 20.0, Option.empty[String]),
      (50L, 500.0, Option.empty[String])).toDF("id", "price", "remark")))
    ()
  }
}
