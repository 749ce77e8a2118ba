package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.GraftTable
import java.nio.file.Files

/** The commit log as a Structured Streaming SOURCE (s16's machinery):
  * offsets are commit versions, micro-batches are log-resolved file
  * slices, delivery is exactly-once across restarts because Spark's
  * checkpointed offsets + immutable commits make every (start, end]
  * slice deterministic forever.
  */
class GraftStreamSpec extends SparkSpec {

  private def multiset(df: DataFrame) =
    df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap

  private def freshDir(tag: String) =
    Files.createTempDirectory(tag).toString

  test("readStream.format(graft) follows the log exactly once across restarts") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      .limit(2000).cache()
    val batches = (0 until 4).map(i =>
      li.filter(col("l_orderkey") % 4 === i).cache())
    batches.foreach(_.count())
    val root = freshDir("graft_stream") + "/t"
    val t = GraftTable.create(spark, root, batches(0))   // v1
    t.append(batches(1))                                 // v2
    val out = freshDir("graft_stream_out")
    val ckpt = freshDir("graft_stream_ckpt")
    def drain(): Unit = {
      val q = spark.readStream.format("graft").load(root)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, id: Long) =>
          b.write.mode("overwrite").parquet(s"$out/b$id")
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    drain() // first run: one micro-batch covering (0, 2]
    assert(multiset(spark.read.parquet(s"$out/b0")) ==
      multiset(batches(0).unionAll(batches(1))),
      "first micro-batch must serve exactly the pre-stream commits")
    // the table advances while the stream is down; restart resumes at
    // the CHECKPOINTED offset — no re-serve, no loss
    t.append(batches(2)); t.append(batches(3))           // v3, v4
    drain()
    val dirs = new java.io.File(out).listFiles.map(_.toString).sorted
    assert(dirs.length == 2, s"expected exactly 2 micro-batches, got $dirs")
    assert(multiset(spark.read.parquet(dirs.toIndexedSeq: _*)) == multiset(li),
      "streamed union diverged from the table: rows lost or duplicated")
    // a third drain with nothing new emits no batch at all
    drain()
    assert(new java.io.File(out).listFiles.length == 2)
    li.unpersist(); batches.foreach(_.unpersist())
    ()
  }

  test("non-append commits in the streamed range refuse; startingVersion skips past them") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      .limit(1200).cache()
    li.count()
    val root = freshDir("graft_stream_na") + "/t"
    val t = GraftTable.create(spark, root,
      li.filter(col("l_orderkey") % 2 === 0).repartition(4)) // v1
    t.append(li.filter(col("l_orderkey") % 2 === 1)
      .repartition(4))                                       // v2
    t.compact(1L << 30)                                      // v3: rewrite
    // streaming from 0 would serve rewritten rows as new — refuse
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("graft").load(root)
        .writeStream
        .option("checkpointLocation", freshDir("graft_stream_na_ck"))
        .format("noop").start()
      try q.processAllAvailable() finally q.stop()
    }
    def chain(x: Throwable): Seq[String] =
      if (x == null) Seq.empty
      else Option(x.getMessage).toSeq ++ chain(x.getCause)
    assert(chain(e).exists(_.contains("non-append")), chain(e).mkString(" | "))
    // startingVersion past the rewrite: the stream serves only what
    // lands after it
    val fresh = li.filter(col("l_orderkey") % 7 === 3)
    val out = freshDir("graft_stream_na_out")
    val ckpt = freshDir("graft_stream_na_ck2")
    def drain(): Unit = {
      val q = spark.readStream.format("graft")
        .option("startingVersion", t.latestVersion)
        .load(root)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, id: Long) =>
          b.write.mode("overwrite").parquet(s"$out/b$id")
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    drain() // nothing after startingVersion yet (batch 0 may be empty)
    def streamed() = {
      val dirs = Option(new java.io.File(out).listFiles)
        .map(_.toSeq).getOrElse(Seq.empty)
        .filter(d => Option(d.listFiles).exists(
          _.exists(_.getName.endsWith(".parquet"))))
        .map(_.toString)
      if (dirs.isEmpty) spark.emptyDataFrame
      else spark.read.parquet(dirs: _*)
    }
    assert(streamed().count() == 0,
      "pre-startingVersion rows leaked into the tail stream")
    t.append(fresh)
    drain()
    assert(multiset(streamed()) == multiset(fresh),
      "tail stream must serve exactly the post-startingVersion append")
    li.unpersist()
    ()
  }

  test("the CDF stream equals the batch changeFeed and follows the tail exactly once") {
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val root = freshDir("graft_cdf_stream") + "/t"
    val t = GraftTable.create(spark, root,
      orders.repartitionByRange(4, col("o_orderkey")))          // v1
    t.deleteWhere(col("o_orderkey") % 7 === 3)                  // v2
    t.update(col("o_orderkey") % 5 === 0,
      Map("o_totalprice" -> (col("o_totalprice") + 1)))         // v3
    val out = freshDir("graft_cdf_out")
    val ckpt = freshDir("graft_cdf_ck")
    def drain(): Unit = {
      val q = spark.readStream.format("graft")
        .option("readChangeFeed", "true").load(root)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, id: Long) =>
          b.write.mode("overwrite").parquet(s"$out/b$id")
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    drain()
    def streamed() = spark.read.parquet(
      new java.io.File(out).listFiles.map(_.toString).toIndexedSeq: _*)
    // bit-for-bit the batch row-level feed, versions included
    assert(multiset(streamed()) == multiset(
      t.changeFeed(0).get.select(streamed().columns.map(col): _*)),
      "streamed CDF diverged from the batch changeFeed")
    // the stream follows later commits exactly once across restart
    t.append(orders.filter(col("o_orderkey") % 13 === 1))       // v4
    drain()
    assert(multiset(streamed()) == multiset(
      t.changeFeed(0).get.select(streamed().columns.map(col): _*)),
      "restarted CDF stream lost or re-served a commit range")
    // an overwrite makes the NEXT range unservable — the stream
    // refuses rather than lying
    t.overwrite(orders.limit(10))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain()
    }
    def chain(x: Throwable): Seq[String] =
      if (x == null) Seq.empty
      else Option(x.getMessage).toSeq ++ chain(x.getCause)
    assert(chain(e).exists(_.contains("whole-scope")), chain(e).mkString("|"))
    ()
  }

  test("the streamed scan keeps parquet pushdown on the batch path (DelegatingScanBuilder)") {
    // the wrapper that grafts toMicroBatchStream onto the ParquetScan
    // must not cost the BATCH path its filter pushdown — re-assert the
    // PushedFilters plan marker through format("graft")
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val root = freshDir("graft_stream_pd") + "/t"
    GraftTable.create(spark, root, li)
    val plan = spark.read.format("graft").load(root)
      .filter(col("l_orderkey") === 42)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,42)]") ||
      (plan.contains("PushedFilters") && plan.contains("EqualTo(l_orderkey,42)")),
      s"pushdown lost through the delegating builder:\n$plan")
  }

  // ---- the native DSv2 STREAMING SINK (writeStream.format("graft")) ----

  private def landSlices(dir: java.nio.file.Path,
                         n: Int): (DataFrame, Seq[DataFrame]) = {
    import org.apache.spark.sql.types._
    val src = dir.resolve("src")
    java.nio.file.Files.createDirectory(src)
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity").limit(2000).cache()
    val slices = (0 until n).map(i => li.filter(col("l_orderkey") % n === i))
    slices.zipWithIndex.foreach { case (s0, i) =>
      val stage = dir.resolve(s"stage$i").toString
      s0.coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = src.resolve(s"slice$i.parquet")
      java.nio.file.Files.move(part.toPath, dst)
      dst.toFile.setLastModified(1000000L * (i + 1))
    }
    val schema = StructType(Seq(StructField("l_orderkey", LongType),
      StructField("l_quantity", DoubleType)))
    (spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(src.toString), slices)
  }

  test("writeStream.format(graft): epoch commits, bootstrap, exactly-once across checkpoint replay") {
    val dir = Files.createTempDirectory("graft_sink")
    val (src, slices) = landSlices(dir, 3)
    val root = dir.resolve("t").toString
    val ckpt = dir.resolve("ckpt").toString
    def drain(): Unit = {
      val q = src.writeStream.format("graft")
        .option("checkpointLocation", ckpt).start(root)
      try q.processAllAvailable() finally q.stop()
    }
    drain()
    val t = GraftTable.forPath(spark, root)
    val want = multiset(slices.reduce(_ unionAll _))
    assert(multiset(t.read()) == want,
      "native sink lost/duplicated rows across epochs")
    assert(t.latestVersion == 3, "one commit per micro-batch expected")
    assert((1L to 3L).forall(v => t.readCommit(v).action.startsWith("append@")),
      "epoch commits must be idempotence-tagged appends")
    assert(t.schemaAt(3).exists(_.fieldNames.toSet ==
      Set("l_orderkey", "l_quantity")),
      "bootstrap must record the stream's schema")
    // CRASH REPLAY: drop the sink's memory of the last epoch — Spark
    // re-runs it; the tag ledger must no-op the duplicate and delete
    // its re-staged files
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.matches("\\d+")).sortBy(_.getName.toInt)
    assert(commits.nonEmpty)
    assert(commits.last.delete())
    // the local fs keeps a checksum sidecar; a stale one would block
    // the replayed epoch's commit-log write with a spurious
    // file-already-exists
    new java.io.File(s"$ckpt/commits/.${commits.last.getName}.crc").delete()
    val filesBefore = t.liveFiles().map(_._1).toSet
    drain()
    assert(multiset(t.read()) == want,
      "epoch replay duplicated rows — exactly-once broken")
    assert(t.liveFiles().map(_._1).toSet == filesBefore,
      "replayed epoch changed the live file set")
    // the replayed epoch's re-staged duplicates were cleaned up
    val orphans = {
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      def walk(p: org.apache.hadoop.fs.Path): Seq[String] =
        fs.listStatus(p).toIndexedSeq.flatMap { st =>
          if (st.isDirectory) walk(st.getPath)
          else Seq(st.getPath.toString)
        }
      walk(new org.apache.hadoop.fs.Path(root, "data"))
        .filter(_.endsWith(".parquet"))
        .map(_.split("/t/", 2).last)
        .filterNot(filesBefore)
    }
    assert(orphans.isEmpty,
      s"replayed epoch left staged orphans: ${orphans.take(3)}")
    ()
  }

  test("native sink: CHECK constraints gate each epoch; violations abort with nothing staged") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_sink_ck")
    val (src, _) = landSlices(dir, 2)
    val root = dir.resolve("t").toString
    val t = GraftTable.create(spark, root,
      Seq((1L, -1.0)).toDF("l_orderkey", "l_quantity"))
    t.addConstraint("positive_qty", "l_quantity < 0") // every REAL row violates
    val v0 = t.latestVersion
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = src.writeStream.format("graft")
        .option("checkpointLocation", dir.resolve("ckpt").toString)
        .start(root)
      try q.processAllAvailable() finally q.stop()
    }
    def chain(x: Throwable): Seq[String] =
      if (x == null) Seq.empty
      else Option(x.getMessage).toSeq ++ chain(x.getCause)
    assert(chain(e).mkString(" ").contains("positive_qty"),
      s"wrong failure: ${chain(e)}")
    assert(t.latestVersion == v0, "a violating epoch must not commit")
    ()
  }

  test("native sink streams while concurrent DML rewrites land (WriteSerializable interplay)") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // seed keys are NEGATIVE, streamed keys positive — the DML verbs
    // target only the seed space, so the final state is deterministic
    // regardless of how epochs and rewrites interleave: the sink's
    // blind appends are tolerated by the DML conflict rule, and the
    // DML's file-scoped rewrites never invalidate an epoch commit
    val dir = Files.createTempDirectory("graft_sink_dml")
    val root = dir.resolve("t").toString
    val seed = (1 to 40).map(i => (-i.toLong, i.toDouble))
      .toDF("l_orderkey", "l_quantity")
    val t = GraftTable.create(spark, root,
      seed.repartitionByRange(4, col("l_orderkey")))
    val src = dir.resolve("src")
    Files.createDirectory(src)
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity").limit(1200).cache()
    val slices = (0 until 4).map(i => li.filter(col("l_orderkey") % 4 === i))
    val schema = StructType(Seq(StructField("l_orderkey", LongType),
      StructField("l_quantity", DoubleType)))
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
      .writeStream.format("graft")
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .start(root)
    try {
      slices.zipWithIndex.foreach { case (s0, i) =>
        val stage = dir.resolve(s"stage$i").toString
        s0.coalesce(1).write.parquet(stage)
        val part = new java.io.File(stage).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        Files.move(part.toPath, src.resolve(s"slice$i.parquet"))
        // interleave a seed-space rewrite with the in-flight stream
        if (i % 2 == 0) t.deleteWhere(col("l_orderkey") === -(i + 1L))
        else t.update(col("l_orderkey") === -(i + 20L),
          Map("l_quantity" -> (col("l_quantity") + 1000.0)))
        q.processAllAvailable()
      }
    } finally q.stop()
    // deterministic final state: every streamed row exactly once, the
    // seed space with exactly the issued deletes/updates applied
    val want = multiset(li) ++ multiset(
      seed.filter(!col("l_orderkey").isin(-1L, -3L))
        .withColumn("l_quantity",
          when(col("l_orderkey").isin(-21L, -23L),
            col("l_quantity") + 1000.0).otherwise(col("l_quantity"))))
    assert(multiset(t.read()) == want,
      "concurrent sink epochs + DML rewrites diverged")
    // and the log holds every epoch as a tagged append plus the DML
    val actions = (1L to t.latestVersion).map(v => t.readCommit(v).action)
    assert(actions.count(_.startsWith("append@stream:")) == 4,
      s"expected 4 epoch commits, got: $actions")
    assert(actions.count(_ == "delete") == 2 &&
      actions.count(_ == "update") == 2, actions.toString)
    li.unpersist()
    ()
  }

  test("native sink: an incompatible stream schema is refused at query start") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_sink_sch")
    val (src, _) = landSlices(dir, 2)
    val root = dir.resolve("t").toString
    GraftTable.create(spark, root, Seq((1L, "x")).toDF("k", "s"))
    val e = intercept[Throwable] {
      val q = src.writeStream.format("graft")
        .option("checkpointLocation", dir.resolve("ckpt").toString)
        .start(root)
      try q.processAllAvailable() finally q.stop()
    }
    def chain(x: Throwable): Seq[String] =
      if (x == null) Seq.empty
      else Option(x.getMessage).toSeq ++ chain(x.getCause)
    assert(chain(e).mkString(" ").contains("schema mismatch"),
      s"wrong failure: ${chain(e)}")
    assert(GraftTable.forPath(spark, root).latestVersion == 1)
    ()
  }

  test("streaming a string-partitioned table restores the partition columns per micro-batch") {
    import spark.implicits._
    val root = freshDir("graft_stream_part") + "/t"
    val t = GraftTable.forPath(spark, root)
    def batch(tag: String, vals: Seq[String]) =
      vals.zipWithIndex.map { case (c, i) => (s"${tag}_$i", 10 + i, c) }
        .toDF("payload", "qty", "country")
    t.appendPartitioned(batch("a", Seq("India", "South Africa")),
      "country")                                            // v1
    t.appendPartitioned(batch("b", Seq("a=b", "India")), "country") // v2
    val out = freshDir("graft_stream_part_out")
    val ckpt = freshDir("graft_stream_part_ckpt")
    def drain(): Unit = {
      val q = spark.readStream.format("graft").load(root)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, id: Long) =>
          b.write.mode("overwrite").parquet(s"$out/b$id")
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    drain()
    val got0 = spark.read.parquet(s"$out/b0")
    // the streamed micro-batch carries the RESTORED string key — the
    // hive-escaped value dirs ('a=b') unescape exactly
    assert(got0.columns.toSet == Set("payload", "qty", "country"))
    assert(multiset(got0) ==
      multiset(batch("a", Seq("India", "South Africa"))
        .unionByName(batch("b", Seq("a=b", "India")))))
    // a post-stream commit restores through the SAME template factory
    t.appendPartitioned(batch("c", Seq("South Africa")), "country") // v3
    drain()
    assert(multiset(spark.read.parquet(s"$out/b1")) ==
      multiset(batch("c", Seq("South Africa"))))
    // the DSv2 BATCH read serves the key column too (the snapshot
    // restoration contract the stream templates from), with pushdown
    // on the restored column still working
    val snap = spark.read.format("graft").load(root)
    assert(snap.columns.toSet == Set("payload", "qty", "country"))
    assert(snap.filter(col("country") === "a=b").count() == 1)
    assert(snap.filter(col("country") === "India").count() == 2)
    ()
  }

  test("cdf stream over a string-partitioned table: inserts restore keys from paths, delete images carry stored keys") {
    import spark.implicits._
    val root = freshDir("graft_cdf_part") + "/t"
    val t = GraftTable.forPath(spark, root)
    val df = Seq((1, "p1", "India"), (2, "p2", "a=b"), (3, "p3", "India"))
      .toDF("id", "payload", "country")
    t.appendPartitioned(df, "country")                       // v1
    t.deleteWhere(col("country") === "India" && col("id") === 1) // v2
    val out = freshDir("graft_cdf_part_out")
    val q = spark.readStream.format("graft")
      .option(graft.sources.GraftCdfStream.Options, "true")
      .load(root)
      .writeStream
      .option("checkpointLocation", freshDir("graft_cdf_part_ck"))
      .foreachBatch { (b: DataFrame, id: Long) =>
        b.write.mode("overwrite").parquet(s"$out/b$id")
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(s"$out/b0")
    assert(got.columns.toSet ==
      Set("id", "payload", "country", "_change_type", "_commit_version"))
    // inserts: all three rows, keys restored from the escaped paths
    val ins = got.filter(col("_change_type") === "insert")
    assert(ins.count() == 3)
    assert(ins.filter(col("country") === "a=b").count() == 1)
    assert(ins.select("_commit_version").distinct().head.getLong(0) == 1L)
    // the delete image carries the stored key column
    val del = got.filter(col("_change_type") === "delete")
    assert(del.count() == 1)
    val dr = del.head
    assert(dr.getAs[Int]("id") == 1 &&
      dr.getAs[String]("country") == "India")
    ()
  }

  test("streaming a two-key (string+date) partitioned table restores both keys") {
    import spark.implicits._
    val root = freshDir("graft_stream_2k") + "/t"
    val t = GraftTable.forPath(spark, root)
    val df = Seq(
      ("x", "IN", java.sql.Date.valueOf("2026-01-01")),
      ("y", "ZA", java.sql.Date.valueOf("2026-01-01")),
      ("z", "IN", java.sql.Date.valueOf("2027-01-01")))
      .toDF("payload", "country", "day")
    t.appendPartitioned(df, Seq("country", "day"), null)    // v1
    val out = freshDir("graft_stream_2k_out")
    val q = spark.readStream.format("graft").load(root)
      .writeStream
      .option("checkpointLocation", freshDir("graft_stream_2k_ck"))
      .foreachBatch { (b: DataFrame, id: Long) =>
        b.write.mode("overwrite").parquet(s"$out/b$id")
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(s"$out/b0")
    assert(got.schema("day").dataType ==
      org.apache.spark.sql.types.DateType)
    assert(multiset(got) == multiset(df))
    ()
  }

  private def writtenBatches(out: String): Seq[String] =
    Option(new java.io.File(out).listFiles).map(_.toSeq).getOrElse(Seq.empty)
      .filter(d => Option(d.listFiles).exists(
        _.exists(_.getName.endsWith(".parquet"))))
      .map(_.toString).sorted

  test("maxFilesPerTrigger bounds each micro-batch; a bootstrap is a sequence of checkpointed batches, exactly-once across a mid-stream failure") {
    import spark.implicits._
    val root = freshDir("graft_stream_adm") + "/t"
    // 8 data files across 3 commits: v1 = 3 files, v2 = 2, v3 = 3
    val rows = (1 to 80).map(i => (i.toLong, s"p$i")).toDF("id", "payload")
    val t = GraftTable.create(spark, root,
      rows.filter(col("id") <= 30).repartition(3))           // v1
    t.append(rows.filter(col("id") > 30 && col("id") <= 50)
      .repartition(2))                                       // v2
    t.append(rows.filter(col("id") > 50).repartition(3))     // v3
    val out = freshDir("graft_stream_adm_out")
    val ckpt = freshDir("graft_stream_adm_ckpt")
    val failOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    def drain(failAtBatch: Long): Unit = {
      val q = spark.readStream.format("graft")
        .option("maxFilesPerTrigger", "3")
        .load(root)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, id: Long) =>
          if (id == failAtBatch && failOnce.getAndSet(false))
            sys.error(s"injected failure at batch $id")
          b.write.mode("overwrite").parquet(s"$out/b$id")
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    // run 1 dies mid-bootstrap: batch 0 lands, batch 1's first attempt
    // fails AFTER the offset was checkpointed — the crash-at-99% shape
    // admission control exists for
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(failAtBatch = 1)
    }
    assert(writtenBatches(out).size == 1,
      "only batch 0 should have landed before the injected failure")
    // restart from the checkpoint: batch 1 REPLAYS deterministically
    // (same offsets → same files), then the rest of the bootstrap
    drain(failAtBatch = -1)
    val dirs = writtenBatches(out)
    // 8 files at 3 per trigger = ceil(8/3) = 3 bounded batches — not
    // one corpus-sized batch
    assert(dirs.size == 3, s"expected 3 bounded micro-batches, got $dirs")
    assert(multiset(spark.read.parquet(dirs: _*)) == multiset(rows),
      "bounded bootstrap diverged: rows lost or duplicated")
    // tail behavior unchanged: a post-bootstrap append streams bounded
    val more = (81 to 90).map(i => (i.toLong, s"p$i")).toDF("id", "payload")
    t.append(more.repartition(4))                            // v4
    drain(failAtBatch = -1)
    val dirs2 = writtenBatches(out)
    assert(dirs2.size == 5, s"4 new files at 3/trigger = 2 more batches: $dirs2")
    assert(multiset(spark.read.parquet(dirs2: _*)) ==
      multiset(rows.unionByName(more)))
    ()
  }

  test("maxBytesPerTrigger bounds by log-recorded size and always admits at least one file") {
    import spark.implicits._
    val root = freshDir("graft_stream_admb") + "/t"
    val rows = (1 to 40).map(i => (i.toLong, s"x$i")).toDF("id", "v")
    GraftTable.create(spark, root, rows.repartition(4))      // v1: 4 files
    val out = freshDir("graft_stream_admb_out")
    val q = spark.readStream.format("graft")
      // 1 byte < any parquet file: the at-least-one rule must admit
      // exactly one file per trigger instead of stalling forever
      .option("maxBytesPerTrigger", "1")
      .load(root)
      .writeStream
      .option("checkpointLocation", freshDir("graft_stream_admb_ck"))
      .foreachBatch { (b: DataFrame, id: Long) =>
        b.write.mode("overwrite").parquet(s"$out/b$id")
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val dirs = writtenBatches(out)
    assert(dirs.size == 4, s"4 files at 1 oversized file/trigger: $dirs")
    assert(multiset(spark.read.parquet(dirs: _*)) == multiset(rows))
    ()
  }

  test("admission-controlled stream over a partitioned table restores keys on mid-commit slices") {
    import spark.implicits._
    val root = freshDir("graft_stream_admp") + "/t"
    val t = GraftTable.forPath(spark, root)
    val df = Seq(("a", 1, "India"), ("b", 2, "a=b"), ("c", 3, "ZA"))
      .toDF("payload", "qty", "country")
    t.appendPartitioned(df, "country")   // v1: 3 value dirs = 3 files
    val out = freshDir("graft_stream_admp_out")
    val q = spark.readStream.format("graft")
      .option("maxFilesPerTrigger", "1")
      .load(root)
      .writeStream
      .option("checkpointLocation", freshDir("graft_stream_admp_ck"))
      .foreachBatch { (b: DataFrame, id: Long) =>
        b.write.mode("overwrite").parquet(s"$out/b$id")
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val dirs = writtenBatches(out)
    // one commit, three files: the cap ends batches MID-COMMIT at the
    // file-granular offset, and every slice still restores the key
    // from its escaped value dir
    assert(dirs.size == 3, s"3 files at 1/trigger: $dirs")
    val got = spark.read.parquet(dirs: _*)
    assert(got.columns.toSet == Set("payload", "qty", "country"))
    assert(multiset(got) == multiset(df))
    ()
  }

  test("the CDF stream rate-limits with the same option surface; mid-commit image splits stay exactly-once") {
    import spark.implicits._
    val root = freshDir("graft_cdf_adm") + "/t"
    val t = GraftTable.forPath(spark, root)
    val df = (1 to 30).map(i => (i, s"p$i")).toDF("id", "payload")
    t.append(df.repartition(3))                              // v1: 3 files
    t.deleteWhere(col("id") % 3 === 0)                       // v2: images
    val out = freshDir("graft_cdf_adm_out")
    def drain(cap: Option[String], outDir: String, ck: String): Int = {
      val r0 = spark.readStream.format("graft")
        .option(graft.sources.GraftCdfStream.Options, "true")
      val q = cap.foldLeft(r0)((r, n) => r.option("maxFilesPerTrigger", n))
        .load(root)
        .writeStream.option("checkpointLocation", ck)
        .foreachBatch { (b: DataFrame, id: Long) =>
          b.write.mode("overwrite").parquet(s"$outDir/b$id")
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
      writtenBatches(outDir).size
    }
    val nCapped = drain(Some("1"), out, freshDir("graft_cdf_adm_ck"))
    val outU = freshDir("graft_cdf_adm_outu")
    drain(None, outU, freshDir("graft_cdf_adm_cku"))
    // the capped feed is the unbounded feed, just in bounded batches —
    // including the DELETE commit's image files split across triggers
    assert(nCapped >= 4, s"3 add files + image file(s) at 1/trigger: $nCapped")
    assert(multiset(spark.read.parquet(writtenBatches(out): _*)) ==
      multiset(spark.read.parquet(writtenBatches(outU): _*)),
      "rate-limited CDF diverged from the unbounded feed")
    ()
  }

  test("Trigger.AvailableNow respects the admission caps, then stops") {
    import spark.implicits._
    val root = freshDir("graft_stream_avnow") + "/t"
    val rows = (1 to 40).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    GraftTable.create(spark, root, rows.repartition(5))      // 5 files
    val out = freshDir("graft_stream_avnow_out")
    val q = spark.readStream.format("graft")
      .option("maxFilesPerTrigger", "2")
      .load(root)
      .writeStream
      .option("checkpointLocation", freshDir("graft_stream_avnow_ck"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, id: Long) =>
        b.write.mode("overwrite").parquet(s"$out/b$id")
        ()
      }.start()
    assert(q.awaitTermination(120000),
      "AvailableNow must terminate once caught up")
    val dirs = writtenBatches(out)
    assert(dirs.size == 3, s"5 files at 2/trigger = 3 batches: $dirs")
    assert(multiset(spark.read.parquet(dirs: _*)) == multiset(rows))
    ()
  }

  test("stream offsets round-trip both shapes; pre-admission checkpoints stay readable") {
    import graft.sources.GraftOffset
    // legacy bare-number shape (what pre-admission checkpoints hold)
    assert(GraftOffset.fromJson("7") == GraftOffset(7L, -1L))
    assert(GraftOffset(7L).json() == "7")
    // file-granular mid-commit shape
    val mid = GraftOffset(4L, 2L)
    assert(GraftOffset.fromJson(mid.json()) == mid)
    ()
  }
}
