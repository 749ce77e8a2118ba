package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.EventStream
import graft.operators.Events
import graft.sources.Readers
import java.nio.file.Files

class StreamSourcesSpec extends SparkSpec {

  test("s11 external-index dedup: cross-batch dups merge, keeper is first-admitted") {
    import spark.implicits._
    // the corpus has no exact dups (d1's situation too), so the
    // cross-batch and within-batch dup paths are driven synthetically:
    // file1 = {A(1), B(2), B(3)}, file2 = {A(10), C(11), A(12)} —
    // B dups within batch 1, A spans both batches
    val dir = Files.createTempDirectory("graft_s11_spec")
    val src = dir.resolve("src"); Files.createDirectory(src)
    def land(rows: Seq[(Long, String)], name: String, ts: Long): Unit = {
      val stage = dir.resolve(name + "_stage").toString
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = src.resolve(name + ".parquet")
      Files.move(part.toPath, dst)
      dst.toFile.setLastModified(ts)
    }
    land(Seq((1L, "alpha text"), (2L, "beta text"), (3L, "beta text")),
      "f1", 1000000L)
    land(Seq((10L, "alpha text"), (11L, "gamma text"), (12L, "alpha text")),
      "f2", 2000000L)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
    val got = EventStream.streamDedupIndex(spark, stream,
        dir.resolve("idx").toString).collect()
      .map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("n_copies")).toMap
    // A: keeper 1 (first admitted), 3 copies total across batches;
    // B: keeper 2, 2 copies within batch 1; C: keeper 11, 1 copy
    assert(got == Map(1L -> 3L, 2L -> 2L, 11L -> 1L),
      s"index state wrong: $got")
    // one commit per batch in the index's GraftTable log, and the
    // index survives as plain parquet any batch job can read
    val t = graft.sources.GraftTable.forPath(spark,
      dir.resolve("idx").toString)
    assert(t.versions().size >= 2)
    assert(t.read().count() > 0)
  }

  test("s14 streamed ANN serving equals the batch stored-index answers") {
    // a query's answer depends only on (query, index): training is
    // deterministic, so the three micro-batches' union must be
    // BIT-EQUAL (ids, cosines, ranks) to the inline e8 answer for the
    // same ten queries — the s1/q22 stream-equals-batch contract
    def key(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getAs[Long]("qid"), r.getAs[Long]("rnk"), r.getAs[Long]("nid"),
        r.getAs[Double]("cosine"))).toSet
    val streamed = key(EventStream.queries("s14_stream_ann_serve")(spark, sf))
    val batch = key(graft.operators.Similarity.queries("e8_knn_ivfpq")(spark, sf))
    assert(streamed == batch,
      "streamed ANN answers diverge from the batch stored-index path")
  }

  test("s13 streamed fuzzy dedup converges to batch d32; cross-batch near-dup caught") {
    import spark.implicits._
    import graft.operators.TextOps
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_id"), r.getAs[Boolean]("admit"),
        Option(r.getAs[java.lang.Long]("dup_of")).map(_.toLong),
        Option(r.getAs[java.math.BigDecimal]("est_jaccard")).map(BigDecimal(_)))
    // convergence (the s1/q22 contract): ascending slices make stream
    // arrival order == doc_id order, so the chained per-batch index
    // probe must answer EXACTLY batch d32 over the same docs with an
    // empty base — verdicts, best matches, and estimates all equal
    val streamed = EventStream.queries("s13_stream_fuzzy_dedup")(spark, sf)
      .collect().map(key).toSet
    val batch = TextOps.d32IncrementalMinhash(
        Tables.documents(spark, sf).select("doc_id", "text"),
        Seq.empty[(Long, String)].toDF("doc_id", "text"))
      .collect().map(key).toSet
    assert(streamed == batch,
      s"streamed fuzzy dedup diverged from batch d32: " +
        s"${(streamed diff batch).take(3)} vs ${(batch diff streamed).take(3)}")
    assert(streamed.size == Tables.documents(spark, sf).count(),
      "a streamed doc lost its verdict")
    assert(streamed.exists(!_._2), "no near-dup rejections at test SF")
    // the cross-batch INDEX path, driven synthetically: the donor
    // lands in batch 1, an unrelated doc in batch 2, and a one-word
    // mutation of the donor in batch 3 — the mutation must be
    // rejected against the DURABLE index (its donor left the stream
    // two micro-batches earlier), everything else admitted
    val donorText = Tables.documents(spark, sf).orderBy("doc_id")
      .head.getAs[String]("text")
    val mutated = donorText.split(" ").zipWithIndex
      .map { case (w, i) => if (i == 0) "zzz" else w }.mkString(" ")
    val dir = Files.createTempDirectory("graft_s13_spec")
    val src = dir.resolve("src"); Files.createDirectory(src)
    def land(rows: Seq[(Long, String)], name: String, ts: Long): Unit = {
      val stage = dir.resolve(name + "_stage").toString
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = src.resolve(name + ".parquet")
      Files.move(part.toPath, dst)
      dst.toFile.setLastModified(ts)
    }
    land(Seq((1L, donorText)), "f1", 1000000L)
    land(Seq((10L, "qq ww ee rr tt yy uu ii oo pp")), "f2", 2000000L)
    land(Seq((30L, mutated)), "f3", 3000000L)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
    val got = EventStream.streamFuzzyDedup(spark, stream,
        dir.resolve("idx").toString).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("admit"), Option(r.getAs[java.lang.Long]("dup_of"))))
      .toMap
    assert(got(1L)._1 && got(10L)._1, "clean docs were rejected")
    assert(!got(30L)._1 && got(30L)._2.contains(1L),
      s"cross-batch near-dup not caught against the index: ${got(30L)}")
    // versioned index survives in the GraftTable log, one commit per
    // signature-bearing batch
    val t = graft.sources.GraftTable.forPath(spark,
      dir.resolve("idx").toString)
    assert(t.versions().size >= 3)
  }

  test("s12 streamed PIT enrichment equals the batch q69 join") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("purchase_id"), r.getAs[Long]("user_id"),
        r.getAs[Long]("purchase_ts_us"), Option(r.getAs[String]("status")),
        Option(r.getAs[java.lang.Long]("status_since_us")).map(_.toLong))
    val stream = EventStream.s12StreamPitEnrich(spark, sf).collect().map(key).toSet
    val batch = Events.q69PitJoin(spark, sf).collect().map(key).toSet
    assert(stream == batch,
      s"streamed PIT diverged from batch: ${stream.size} vs ${batch.size}")
    // row preservation: left enrichment must not drop or fan out
    assert(stream.size == Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count())
  }

  test("streaming window agg converges to the batch q22 answer") {
    val stream = EventStream.s1StreamWindow(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n"), r.getAs[Double]("total_value"))).toMap
    val batch = Events.q22EventWindow(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n"), r.getAs[Double]("total_value"))).toMap
    assert(stream == batch)
  }

  test("append-mode window emits exactly the closed-window subset of q22") {
    // final watermark = floor(max event-time ms) - 1h; a window is
    // emitted (and its state evicted) iff its END <= that watermark.
    // This pins the boundary the DuckDB oracle encodes.
    val maxUs = Tables.events(spark, sf)
      .agg(max(expr("ts div 1000"))).head.getLong(0)
    val watermarkMs = maxUs / 1000 - 3600000L
    val closed = Events.q22EventWindow(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n"), r.getAs[Double]("total_value")))
      .filter { case ((hour, _), _) =>
        val endMs = java.time.LocalDateTime
          .parse(hour.replace(" ", "T") + ":00")
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli + 3600000L
        endMs <= watermarkMs
      }.toMap
    val emitted = EventStream.s1bStreamWindowAppend(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n"), r.getAs[Double]("total_value"))).toMap
    assert(closed.nonEmpty, "no closed windows at test SF — widen the data")
    assert(emitted == closed,
      s"append emitted ${emitted.keySet} but closed set is ${closed.keySet}")
    // and it must be a strict subset of the complete-mode answer
    // (open windows withheld), or the watermark did nothing
    val all = Events.q22EventWindow(spark, sf).count()
    assert(emitted.size < all, "append mode emitted every window — no state bound")
  }

  test("s8 top types equal batch ranks over the closed-window subset") {
    val maxUs = Tables.events(spark, sf)
      .agg(max(expr("ts div 1000"))).head.getLong(0)
    val watermarkMs = maxUs / 1000 - 3600000L
    val expect = Events.q22EventWindow(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n")))
      .filter { case (hour, _, _) =>
        java.time.LocalDateTime.parse(hour.replace(" ", "T") + ":00")
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli + 3600000L <=
          watermarkMs
      }
      .groupBy(_._1).toSeq.flatMap { case (hour, rows) =>
        rows.sortBy(t => (-t._3, t._2)).take(3).zipWithIndex
          .map { case ((_, tpe, n), i) => (hour, tpe, n, i + 1) }
      }.toSet
    val got = EventStream.s8StreamTopTypes(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n"),
        r.getAs[Int]("rnk"))).toSet
    assert(expect.nonEmpty, "no closed windows at test SF")
    assert(got == expect)
  }

  test("streaming sessionization matches batch q21 session counts") {
    val stream = EventStream.s3StreamSession(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_sessions")).toMap
    val batch = Events.q21Sessionize(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_sessions")).toMap
    assert(stream == batch)
  }

  test("streaming dedup actually dedups: doubled corpus collapses to true counts") {
    // the generator's event_ids are unique, so s2's oracle holds
    // trivially on the shipped data and a dedup regression would be
    // invisible; feed a corpus with EVERY event duplicated (same id,
    // same event time — within watermark by construction) and the
    // stream must collapse back to the original per-type counts
    val dir = Files.createTempDirectory("graft_dup_events")
    val base = Tables.events(spark, sf)
    val stage = dir.resolve("stage").toString
    base.unionByName(base).coalesce(1).write.parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath, dir.resolve("events.parquet"))
    val got = EventStream.s2StreamDedup(spark, dir.toString).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_unique")).toMap
    val want = base.groupBy("event_type")
      .agg(countDistinct(col("event_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    assert(got == want, s"dedup diverged: $got vs $want")
  }

  test("checkpointed streaming parquet sink lands the deduped stream") {
    val base = Files.createTempDirectory("graft_fsink")
    val out = EventStream.streamDedupToParquet(spark, sf,
      s"$base/out", s"$base/ckpt")
    val expected = Tables.events(spark, sf)
      .select(countDistinct(col("event_id"))).head.getLong(0)
    assert(out.count() == expected)
    // the checkpoint recorded the committed batch
    assert(new java.io.File(s"$base/ckpt/commits").list().nonEmpty)
  }

  test("stream-stream join lands in the checkpointed parquet sink, not the driver") {
    // s5's output is corpus-proportional — the production landing is
    // the file sink; this exercises that path and proves it emits
    // exactly the batch interval-join rows
    val base = Files.createTempDirectory("graft_joinsink")
    val out = EventStream.streamJoinToParquet(spark, sf,
      s"$base/out", s"$base/ckpt")
    val ev = Tables.events(spark, sf)
      .withColumn("ts_us", expr("ts div 1000"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
              col("ts_us").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
              col("user_id").as("p_user"), col("ts_us").as("purchase_ts"))
    val batch = purchases.join(clicks,
        col("p_user") === col("user_id") &&
          col("click_ts") >= col("purchase_ts") - 3600000000L &&
          col("click_ts") <= col("purchase_ts"))
      .select("purchase_id", "click_id", "user_id")
    val got = out.select("purchase_id", "click_id", "user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = batch.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"file-sink join diverged: ${got.size} vs ${want.size} rows")
    assert(new java.io.File(s"$base/ckpt/commits").list().nonEmpty)
  }

  test("streaming upsert merges identically under any micro-batch slicing") {
    // s7's registry merge is associative state (counts add, latest is
    // max_by) — slicing the stream into one-file micro-batches MUST
    // land the same registry as the single-batch run and as the batch
    // aggregate. 3 splits -> 3 foreachBatch merges, each versioned.
    val dir = Files.createTempDirectory("graft_s7_spec")
    val src = dir.resolve("src").toString
    Tables.events(spark, sf).repartition(3).write.parquet(src)
    val stream = spark.readStream.schema(EventStream.eventsSchema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val root = dir.resolve("reg").toString
    val got = EventStream.upsertToRegistry(spark, stream, root).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val versions = graft.sources.GraftTable.forPath(spark, root)
      .versions().size
    assert(versions >= 3, s"expected >=3 merged versions, got $versions")
    val want = Tables.events(spark, sf).groupBy("user_id").agg(
        count(lit(1)).as("n_events"),
        expr("max_by(struct(event_type, value), struct(ts, event_id))").as("l"))
      .select(col("user_id"), col("n_events"),
        col("l.event_type"), col("l.value"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    assert(got.sameElements(want),
      s"sliced streaming upsert diverged from batch: ${got.length} vs ${want.length}")
  }

  test("streaming upsert bucket-prunes: a single-user batch rewrites one bucket") {
    // the registry is hash-partitioned on pmod(user_id, 8); a batch
    // must read+rewrite ONLY the buckets its users hash into. Land
    // two source files — every user but 7, then user 7 alone — as
    // separate micro-batches: user 7's batch must produce a version
    // holding exactly bucket=7 (the untouched registry is never
    // copied), and the merged registry must still equal the batch
    // aggregate over the full corpus.
    val dir = Files.createTempDirectory("graft_s7_prune")
    val srcDir = dir.resolve("src")
    Files.createDirectory(srcDir)
    val ev = Tables.events(spark, sf)
    def land(df: org.apache.spark.sql.DataFrame, name: String, ts: Long): Unit = {
      val stage = dir.resolve(name + "_stage").toString
      df.coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = srcDir.resolve(name + ".parquet")
      java.nio.file.Files.move(part.toPath, dst)
      dst.toFile.setLastModified(ts)
    }
    land(ev.filter(col("user_id") =!= 7L), "bulk", 1000000L)
    land(ev.filter(col("user_id") === 7L), "solo", 2000000L)
    val stream = spark.readStream.schema(EventStream.eventsSchema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
    val root = dir.resolve("reg").toString
    val got = EventStream.upsertToRegistry(spark, stream, root).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    // pruning asserted through the COMMIT LOG: the solo batch's
    // commit added files only under bucket=7 (the untouched registry
    // was never rewritten), the bulk batch's commit spans many buckets
    val t = graft.sources.GraftTable.forPath(spark, root)
    def bucketsOf(c: graft.sources.GraftTable#Commit): Set[String] =
      c.adds.map(_.path).flatMap(
        "bucket=\\d+".r.findFirstIn(_)).toSet
    val commits = t.versions().map(t.readCommit)
    assert(commits.exists(c =>
        c.adds.nonEmpty && bucketsOf(c) == Set("bucket=7")),
      s"no commit rewrote only user 7's bucket: " +
        commits.map(c => c.version -> bucketsOf(c)))
    assert(commits.exists(c => bucketsOf(c).size > 1),
      "the multi-user batch should have touched several buckets")
    val want = ev.groupBy("user_id").agg(
        count(lit(1)).as("n_events"),
        expr("max_by(struct(event_type, value), struct(ts, event_id))").as("l"))
      .select(col("user_id"), col("n_events"),
        col("l.event_type"), col("l.value"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    assert(got.sameElements(want),
      s"bucket-pruned upsert diverged from batch: ${got.length} vs ${want.length}")
  }

  test("s7 registry manifest is durable: a second process merges prior state") {
    // the manifest (bucket -> latest version) persists to
    // root/_manifest after every batch; a NEW upsertToRegistry
    // invocation on the same root — a restarted driver — must merge
    // fresh batches against the pre-existing registry, not an empty
    // view. Split events by event_id parity (every user appears in
    // BOTH halves) so the second run exercises genuine per-user
    // partial-state merging across the process boundary.
    val dir = Files.createTempDirectory("graft_s7_durable")
    val root = dir.resolve("reg").toString
    val ev = Tables.events(spark, sf)
    def ingest(half: Long): org.apache.spark.sql.DataFrame = {
      val src = dir.resolve(s"src$half").toString
      ev.filter(col("event_id") % 2 === half).repartition(1).write.parquet(src)
      val stream = spark.readStream.schema(EventStream.eventsSchema).parquet(src)
      EventStream.upsertToRegistry(spark, stream, root,
        ckptDir = Some(dir.resolve(s"ckpt$half").toString))
    }
    ingest(0L)
    val got = ingest(1L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val want = ev.groupBy("user_id").agg(
        count(lit(1)).as("n_events"),
        expr("max_by(struct(event_type, value), struct(ts, event_id))").as("l"))
      .select(col("user_id"), col("n_events"),
        col("l.event_type"), col("l.value"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    assert(got.sameElements(want),
      s"restarted registry diverged from batch: ${got.length} vs ${want.length}")
  }

  test("stateful streaming runs under the RocksDB state store (the scale backend)") {
    // the default HDFS-backed store keeps every key's state on the
    // executor HEAP — the memory ceiling for large stateful queries;
    // RocksDB spills state to local disk and is the backend a 100 TB
    // deployment runs. Prove the operators are provider-agnostic:
    // the same watermarked session-window and custom-state queries
    // return identical results under RocksDB.
    val rocks = spark.newSession()
    rocks.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    assert(rows(EventStream.s3StreamSession(rocks, sf)) ==
           rows(EventStream.s3StreamSession(spark, sf)),
      "session windows diverged under RocksDB state store")
    assert(rows(EventStream.s4StreamCustomState(rocks, sf)) ==
           rows(EventStream.s4StreamCustomState(spark, sf)),
      "flatMapGroupsWithState diverged under RocksDB state store")
  }

  test("orc round-trips lineitem with schema intact") {
    val dir = Files.createTempDirectory("graft_orc").toString
    val li = Tables.lineitem(spark, sf).limit(100)
    Readers.writeOrc(li, dir)
    val back = Readers.orc(spark, dir)
    assert(back.count() == 100)
    assert(back.schema == li.schema)
  }

  test("csv reader round-trips through a partitioned parquet write") {
    val dir = Files.createTempDirectory("graft_src").toFile
    val csvPath = new java.io.File(dir, "in.csv").getAbsolutePath
    Files.writeString(java.nio.file.Paths.get(csvPath),
      "country,sku,quant,yearmonth\nAustria,SKU01,779,202304\nSpain,SKU02,113,202305\n")
    val schema = StructType(Seq(
      StructField("country", StringType), StructField("sku", StringType),
      StructField("quant", LongType), StructField("yearmonth", IntegerType)))
    val df = Readers.csv(spark, csvPath, schema)
    assert(df.count() == 2)
    val outPath = new java.io.File(dir, "out").getAbsolutePath
    Readers.writePartitioned(df, outPath, Seq("yearmonth"))
    val back = Readers.parquet(spark, outPath)
    assert(back.count() == 2)
    // partition pruning: filter on the partition column scans one dir
    val plan = back.filter(col("yearmonth") === 202304)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(yearmonth"),
      s"no partition filter in:\n$plan")
  }

  test("s10 streamed z-ordered segments prune and preserve content") {
    import org.apache.spark.sql.functions.{input_file_name, min => fmin, max => fmax}
    val dir = java.nio.file.Files.createTempDirectory("s10spec").toString
    val agg = graft.streaming.EventStream
      .s10StreamZorderIngestTo(spark, sf, dir).collect()
    // end-to-end content: every event landed exactly once
    val total = Tables.events(spark, sf).count()
    assert(agg.map(_.getAs[Long]("n_events")).sum == total)
    // the streamed layout prunes: a day slice must not touch every
    // file of the segment set (the property a plain append sink lacks)
    val t = graft.sources.GraftTable.forPath(spark, s"$dir/table")
    assert(t.versions().nonEmpty, "segments must land as table commits")
    val back = t.read()
    val ranges = back.groupBy(input_file_name())
      .agg(fmin("day").as("dlo"), fmax("day").as("dhi"))
      .collect().map(r => (r.getAs[Long]("dlo"), r.getAs[Long]("dhi")))
    assert(ranges.length >= 4, s"expected several segment files, got ${ranges.length}")
    val dayLo = ranges.map(_._1).min
    val touched = ranges.count { case (lo, hi) => hi >= dayLo + 2 && lo <= dayLo + 5 }
    assert(touched < ranges.length,
      s"day slice touched all ${ranges.length} files — layout not selective")
  }

  test("s9 observed DQ counters conserve rows against the gated result") {
    val (result, metrics) =
      graft.streaming.EventStream.s9StreamDqGateWithMetrics(spark, sf)
    val total = Tables.events(spark, sf).count()
    val low = Tables.events(spark, sf).filter(col("value") < 1.0).count()
    assert(low > 0, "no gated rows at test SF — the gate is untested")
    // the observed counters summed over micro-batches see every
    // source row exactly once
    assert(metrics("n_rows") == total, s"observed ${metrics("n_rows")} != $total")
    assert(metrics("n_low_value") == low)
    // conservation: observed − gated-out == rows aggregated downstream
    val kept = result.collect().map(_.getAs[Long]("n_events")).sum
    assert(kept == total - low,
      s"gate dropped/double-counted: kept $kept of ${total - low}")
    // and the gated aggregate equals its batch twin exactly
    val batch = Tables.events(spark, sf).filter(col("value") >= 1.0)
      .groupBy("event_type")
      .agg(count(org.apache.spark.sql.functions.lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("total_value"))
      .orderBy("event_type").collect()
    assert(result.collect().sameElements(batch))
  }
}
