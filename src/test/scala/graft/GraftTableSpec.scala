package graft

import org.apache.spark.sql.functions._
import graft.sources.GraftTable
import java.nio.file.Files

class GraftTableSpec extends SparkSpec {

  private def multiset(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap

  private def freshRoot() =
    Files.createTempDirectory("graft_table").toString + "/t"

  test("append / overwrite / time travel return exactly each version's rows") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val a = li.filter(col("l_orderkey") % 3 === 0)
    val b = li.filter(col("l_orderkey") % 3 === 1)
    val c = li.filter(col("l_orderkey") % 3 === 2)
    val t = GraftTable.create(spark, freshRoot(), a)         // v1
    t.append(b)                                              // v2
    t.overwrite(c)                                           // v3
    assert(t.latestVersion == 3)
    assert(multiset(t.readVersion(1)) == multiset(a))
    assert(multiset(t.readVersion(2)) == multiset(a.unionAll(b)))
    assert(multiset(t.readVersion(3)) == multiset(c))
    assert(multiset(t.read()) == multiset(c))
    val h = t.history().orderBy("version").collect()
    assert(h.map(_.getAs[String]("action")).toSeq ==
      Seq("append", "append", "overwrite"))
    // overwrite removed every prior live file
    assert(h(2).getAs[Long]("n_removed") ==
      h(0).getAs[Long]("n_added") + h(1).getAs[Long]("n_added"))
  }

  test("compact is content-neutral, bounds file count, never touches compliant files") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey",
      "l_quantity", "l_shipdate")
    val t = GraftTable.create(spark, freshRoot(),
      li.filter(col("l_orderkey") % 4 =!= 0).coalesce(1))   // one big file
    (1 to 3).foreach { i =>                                  // fragmented appends
      t.append(li.filter(col("l_orderkey") % 4 === 0 &&
        col("l_partkey") % 3 === (i - 1)).repartition(4))
    }
    val before = multiset(t.read())
    val live = t.liveFiles()
    val bigBytes = live.map(_._2).max
    val target = bigBytes * 2                                // big file compliant
    val smallIn = live.filter(_._2 < target / 2)
    val v = t.compact(target)
    assert(multiset(t.read()) == before, "compact changed the row multiset")
    val after = t.liveFiles()
    // compliant file survived with identical identity (path AND bytes)
    val compliant = live.filter(_._2 >= target / 2)
    assert(compliant.forall(after.contains),
      "a compliant file was rewritten by compact")
    val expectOut = math.max(1L,
      (smallIn.map(_._2).sum + target - 1) / target)
    assert(after.size == compliant.size + expectOut,
      s"got ${after.size} live files, want ${compliant.size} + $expectOut")
    // idempotent: nothing left to compact
    assert(t.compact(target) == v, "second compact should be a no-op")
    // time travel across the compaction still serves the old layout
    assert(multiset(t.readVersion(v - 1)) == before)
  }

  test("a pinned snapshot is isolated from concurrent append and compact") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val a = li.filter(col("l_orderkey") % 2 === 0)
    val t = GraftTable.create(spark, freshRoot(), a.repartition(6))
    val pinned = t.read()                   // resolves v1's file list NOW
    val want = multiset(a)
    t.append(li.filter(col("l_orderkey") % 2 === 1))
    t.compact(1L << 30)                     // rewrites v1's small files
    assert(t.history().count() >= 3)
    assert(multiset(pinned) == want,
      "a reader's pinned snapshot was perturbed by later commits")
  }

  test("concurrent appenders all win distinct versions; no rows lost") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      .limit(4000).cache()
    li.count()
    val t = GraftTable.create(spark, freshRoot(),
      li.filter(col("l_orderkey") % 5 === 4))
    val writers = Future.sequence((0 to 3).map { w =>
      Future { t.append(li.filter(col("l_orderkey") % 5 === w)) }
    })
    val got = Await.result(writers, 120.seconds)
    assert(got.toSet.size == 4, s"version collision: $got")
    assert(t.latestVersion == 5)
    assert(multiset(t.read()) == multiset(li),
      "concurrent appends lost or duplicated rows")
    li.unpersist()
    ()
  }

  test("append racing compact: every row survives, every read is a committed snapshot") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      .limit(3000).cache()
    val batches = (0 until 6).map(i =>
      li.filter(col("l_orderkey") % 6 === i).cache())
    batches.foreach(_.count())
    val t = GraftTable.create(spark, freshRoot(), batches.head.repartition(3))
    val appender = Future {
      batches.tail.foreach(b => t.append(b.repartition(3)))
    }
    val compactor = Future {
      (1 to 4).foreach { _ =>
        try t.compact(1L << 30)
        catch { case _: java.util.ConcurrentModificationException => () }
        Thread.sleep(30)
      }
    }
    Await.result(Future.sequence(Seq(appender, compactor)), 180.seconds)
    assert(multiset(t.read()) == multiset(li),
      "append racing compact lost or duplicated rows")
    // every historical version is a readable committed snapshot whose
    // count is a prefix-sum of the appended batches (compacts neutral)
    val counts = batches.map(_.count())
    val prefixCounts = counts.scanLeft(0L)(_ + _).drop(1).toSet
    t.versions().foreach { v =>
      assert(prefixCounts.contains(t.readVersion(v).count()),
        s"version $v is not a committed append boundary")
    }
    (li +: batches).foreach(_.unpersist())
    ()
  }

  test("a commit whose removes are no longer live aborts (optimistic concurrency)") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val t = GraftTable.create(spark, freshRoot(), li.repartition(5))
    val stale = t.liveFiles().map(_._1)
    t.compact(1L << 30)                     // swaps those files out
    intercept[java.util.ConcurrentModificationException] {
      t.commit("overwrite", Seq.empty, stale)
    }
    ()
  }

  test("checkpointed log resolves correctly past the checkpoint boundary") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      .limit(1200).cache()
    li.count()
    val root = freshRoot()
    val t = GraftTable.create(spark, root,
      li.filter(col("l_orderkey") % 12 === 0))
    (1 until 12).foreach(i =>
      t.append(li.filter(col("l_orderkey") % 12 === i)))
    assert(t.latestVersion == 12)
    // a checkpoint exists and post-checkpoint resolution matches
    val log = new java.io.File(s"$root/_graft_log")
    assert(log.listFiles().exists(_.getName.startsWith("ckpt-v")),
      "no checkpoint written after 8+ commits")
    assert(multiset(t.read()) == multiset(li))
    assert(multiset(t.readVersion(9)) ==
      multiset(li.filter(col("l_orderkey") % 12 <= 8)))
    li.unpersist()
    ()
  }

  test("appendIdempotent: replayed batch tags are no-ops, durable across reopen") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val b0 = li.filter(col("l_orderkey") % 2 === 0)
    val b1 = li.filter(col("l_orderkey") % 2 === 1)
    val root = freshRoot()
    val t = GraftTable.forPath(spark, root)
    assert(t.appendIdempotent(b0, "batch-0").contains(1L))
    assert(t.appendIdempotent(b1, "batch-1").contains(2L))
    // in-session replay (foreachBatch retry) is a no-op
    assert(t.appendIdempotent(b1, "batch-1").isEmpty)
    assert(multiset(t.read()) == multiset(li))
    // replay after a "driver restart" (fresh handle, durable log scan)
    val t2 = GraftTable.forPath(spark, root)
    assert(t2.appendIdempotent(b0, "batch-0").isEmpty)
    assert(t2.appendIdempotent(b1, "batch-1").isEmpty)
    assert(t2.latestVersion == 2)
    assert(multiset(t2.read()) == multiset(li))
  }

  test("changesSince serves exactly the appended rows, refuses non-append ranges") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val a = li.filter(col("l_orderkey") % 3 === 0)
    val b = li.filter(col("l_orderkey") % 3 === 1)
    val c = li.filter(col("l_orderkey") % 3 === 2)
    val t = GraftTable.create(spark, freshRoot(), a)   // v1
    t.append(b)                                        // v2
    t.append(c)                                        // v3
    // the (1, 3] feed is b ∪ c — new rows only, never a table read
    assert(multiset(t.changesSince(1).get) == multiset(b.unionAll(c)))
    assert(multiset(t.changesSince(1, untilVersion = 2).get) == multiset(b))
    assert(t.changesSince(3).isEmpty, "empty range must be None")
    t.compact(1L << 30)                                // v4: non-append
    intercept[IllegalStateException] { t.changesSince(1) }
    // a range that stops before the compact still serves
    assert(multiset(t.changesSince(2, untilVersion = 3).get) == multiset(c))
    // vacuumed range: the feed must refuse rather than silently serve
    // only the surviving commits' rows
    t.vacuum(retainVersions = 1, orphanGraceMillis = 0)
    val e = intercept[IllegalStateException] { t.changesSince(0) }
    assert(e.getMessage.contains("vacuumed"), e.getMessage)
  }

  test("restore rolls forward to an old snapshot without rewriting history") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val a = li.filter(col("l_orderkey") % 2 === 0)
    val b = li.filter(col("l_orderkey") % 2 === 1)
    val t = GraftTable.create(spark, freshRoot(), a)   // v1
    t.append(b)                                        // v2
    t.overwrite(b.limit(10))                           // v3: the bad commit
    val v4 = t.restore(2)
    assert(v4 == 4, "restore must be a NEW commit, not a history rewrite")
    assert(multiset(t.read()) == multiset(a.unionAll(b)),
      "restored state must equal version 2's rows")
    // history intact: the bad overwrite is still auditable
    assert(t.history().orderBy("version").collect()
      .map(_.getAs[String]("action")).toSeq ==
      Seq("append", "append", "overwrite", "restore:2"))
    // and time travel to the bad version still works
    assert(t.readVersion(3).count() == 10)
  }

  test("compactZOrder is content-neutral and clusters both dimensions") {
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey", "l_quantity")
    val t = GraftTable.create(spark, freshRoot(), li.repartition(8))
    val before = multiset(t.read())
    val v = t.compactZOrder("l_orderkey", "l_partkey", numFiles = 6)
    assert(multiset(t.read()) == before, "z-order changed the row multiset")
    // every pre-zorder file was swapped out in the one commit
    val c = t.readCommit(v)
    assert(c.action.startsWith("zorder:") && c.removes.size == 8)
    // both dimensions' per-file ranges are now selective: no single
    // file spans the full range of either column
    import org.apache.spark.sql.functions.{input_file_name, min => fmin, max => fmax}
    val ranges = t.read().groupBy(input_file_name())
      .agg(fmin("l_orderkey").as("olo"), fmax("l_orderkey").as("ohi"),
        fmin("l_partkey").as("plo"), fmax("l_partkey").as("phi"))
      .collect()
    assert(ranges.length >= 4)
    val (oLo, oHi) = (ranges.map(_.getAs[Long]("olo")).min,
      ranges.map(_.getAs[Long]("ohi")).max)
    val fullSpan = ranges.count(r =>
      r.getAs[Long]("olo") == oLo && r.getAs[Long]("ohi") == oHi)
    assert(fullSpan < ranges.length,
      "every file spans the full l_orderkey range — no clustering")
    // time travel across the layout change still serves the old rows
    assert(multiset(t.readVersion(v - 1)) == before)
  }

  test("adoptDir publishes a caller-staged segment atomically and idempotently") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val a = li.filter(col("l_orderkey") % 2 === 0)
    val b = li.filter(col("l_orderkey") % 2 === 1)
    val t = GraftTable.create(spark, freshRoot(), a)
    val stage = Files.createTempDirectory("graft_adopt").toString + "/seg"
    b.write.parquet(stage)
    assert(t.adoptDir(stage, tag = "seg-1").contains(2L))
    assert(multiset(t.read()) == multiset(li))
    assert(!new java.io.File(stage).exists, "staged dir must move, not copy")
    // adoption IS an append: the change feed serves exactly its rows
    assert(multiset(t.changesSince(1).get) == multiset(b))
    // replayed tag: the re-staged segment is dropped, the table unchanged
    b.write.parquet(stage)
    assert(t.adoptDir(stage, tag = "seg-1").isEmpty)
    assert(!new java.io.File(stage).exists,
      "replayed segment must be cleaned up")
    assert(multiset(t.read()) == multiset(li))
  }

  test("nextChanges: durable cursor consumes each commit range exactly once") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val batches = (0 until 3).map(i => li.filter(col("l_orderkey") % 3 === i))
    val t = GraftTable.create(spark, freshRoot(), batches.head)   // v1
    val cursorDir = freshRoot()
    // first consumption sees v1
    val (d1, f1, t1, c1) = t.nextChanges(cursorDir)
    assert(f1 == 0 && t1 == 1 && multiset(d1.get) == multiset(batches(0)))
    // crash before commit: the SAME range re-presents
    val (d1b, _, _, _) = t.nextChanges(cursorDir)
    assert(multiset(d1b.get) == multiset(batches(0)))
    c1()
    // nothing new -> empty batch
    val (dEmpty, fe, te, _) = t.nextChanges(cursorDir)
    assert(dEmpty.isEmpty && fe == 1 && te == 1)
    // two more commits consumed as one range
    t.append(batches(1)); t.append(batches(2))
    val (d2, f2, t2, c2) = t.nextChanges(cursorDir)
    assert(f2 == 1 && t2 == 3)
    assert(multiset(d2.get) == multiset(batches(1).unionAll(batches(2))))
    c2()
    assert(t.nextChanges(cursorDir)._1.isEmpty)
  }

  test("nextRowChanges: the row-level cursor loop replays an imaged backfill as deltas (round 16)") {
    import spark.implicits._
    val root = freshRoot()
    val t = GraftTable.forPath(spark, root)
    t.appendPartitioned(Seq((1L, 10.0, "a"), (2L, 20.0, "a"),
      (3L, 30.0, "b")).toDF("id", "price", "seg"), "seg")     // v1
    val cursorDir = freshRoot()
    val (d1, _, _, c1) = t.nextRowChanges(cursorDir)
    assert(d1.get.filter(col("_change_type") === "insert").count() == 3)
    c1()
    // the q97 shape WITH images: the consumer replays deltas
    t.replaceWhere(col("seg") === "a",
      Seq((9L, 90.0, "a")).toDF("id", "price", "seg"),
      cdfImages = true)                                       // v2
    val (d2, f2, t2, c2) = t.nextRowChanges(cursorDir)
    assert(f2 == 1 && t2 == 2)
    val byType = d2.get.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("delete" -> 2L, "insert" -> 1L),
      s"the imaged backfill must replay as deltas: $byType")
    c2()
    // an IMAGELESS replace propagates the loud refusal — the consumer
    // must full-rebuild, never silently skip the range
    t.replaceWhere(col("seg") === "a",
      Seq((7L, 70.0, "a")).toDF("id", "price", "seg"))        // v3
    val e = intercept[IllegalStateException] {
      t.nextRowChanges(cursorDir)
    }
    assert(e.getMessage.contains("whole-scope"), e.getMessage)
    ()
  }

  test("randomized op sequences match an in-memory model at every version") {
    // model-based check: a seeded random walk over the verb set
    // (append / overwrite / compact / zorder / restore / deleteWhere)
    // must leave EVERY historical version's readVersion equal to the
    // model's prediction — the whole-protocol invariant the per-verb
    // cases can't compose on their own
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey", "l_quantity").limit(900).cache()
    li.count()
    val rnd = new scala.util.Random(42)
    def slice() = {
      val m = rnd.nextInt(5) + 2; val r = rnd.nextInt(m)
      val df = li.filter(col("l_orderkey") % m === r)
      (df, multiset(df))
    }
    (1 to 2).foreach { trial =>
      val t = GraftTable.forPath(spark, freshRoot())
      val versionRows =
        scala.collection.mutable.Map.empty[Long, Map[Seq[Any], Int]]
      var current: Map[Seq[Any], Int] = Map.empty
      def record(v: Long): Unit = { versionRows(v) = current }
      val (d0, m0) = slice()
      current = m0; record(t.append(d0.repartition(3)))
      spark.conf.set("spark.sql.catalog.gmw",
        classOf[graft.sources.GraftCatalog].getName)
      (1 to 12).foreach { _ =>
        rnd.nextInt(14) match {
          case 0 =>
            val (df, m) = slice()
            current = (current.keySet ++ m.keySet).map(k =>
              k -> (current.getOrElse(k, 0) + m.getOrElse(k, 0))).toMap
            record(t.append(df))
          case 1 =>
            val (df, m) = slice()
            current = m; record(t.overwrite(df))
          case 2 =>
            record(t.compact(1L << 30)) // content-neutral (no-op ok)
          case 3 => // content-neutral (zorder refuses an EMPTY table —
            // a delete may legitimately have emptied it; skip then)
            if (current.nonEmpty)
              record(t.compactZOrder("l_orderkey", "l_partkey", 3))
          case 4 =>
            val target = versionRows.keys.toSeq.sorted
              .apply(rnd.nextInt(versionRows.size))
            current = versionRows(target)
            record(t.restore(target))
          case 5 => // copy-on-write DELETE, modeled as a map filter
            val m = rnd.nextInt(4) + 2; val r = rnd.nextInt(m)
            current = current.filter { case (row, _) =>
              row.head.asInstanceOf[Long] % m != r }
            record(t.deleteWhere(col("l_orderkey") % m === r))
          case 6 => // copy-on-write UPDATE, modeled as a map transform
            val m = rnd.nextInt(4) + 2; val r = rnd.nextInt(m)
            current = current.toSeq.map { case (row, n) =>
              val key =
                if (row.head.asInstanceOf[Long] % m == r)
                  row.updated(2, row(2).asInstanceOf[Double] + 1.0)
                else row
              key -> n
            }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
            record(t.update(col("l_orderkey") % m === r,
              Map("l_quantity" -> (col("l_quantity") + 1.0))))
          case 7 => // MERGE-ON-READ delete: same row semantics, dv path
            val m = rnd.nextInt(4) + 2; val r = rnd.nextInt(m)
            current = current.filter { case (row, _) =>
              row.head.asInstanceOf[Long] % m != r }
            record(t.deleteWhere(col("l_orderkey") % m === r, mor = true))
          case 8 => // MERGE-ON-READ update
            val m = rnd.nextInt(4) + 2; val r = rnd.nextInt(m)
            current = current.toSeq.map { case (row, n) =>
              val key =
                if (row.head.asInstanceOf[Long] % m == r)
                  row.updated(2, row(2).asInstanceOf[Double] + 1.0)
                else row
              key -> n
            }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
            record(t.update(col("l_orderkey") % m === r,
              Map("l_quantity" -> (col("l_quantity") + 1.0)), mor = true))
          case 9 => // PURGE: content-neutral dv materialization
            record(t.purge())
          case 10 => // SQL UPDATE statement ≡ the update verb's model
            val m = rnd.nextInt(4) + 2; val r = rnd.nextInt(m)
            current = current.toSeq.map { case (row, n) =>
              val key =
                if (row.head.asInstanceOf[Long] % m == r)
                  row.updated(2, row(2).asInstanceOf[Double] + 1.0)
                else row
              key -> n
            }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
            spark.sql(s"UPDATE gmw.`${t.root}` SET " +
              s"l_quantity = l_quantity + 1.0 WHERE l_orderkey % $m = $r")
            record(t.latestVersion)
          case 11 => // SQL DELETE FROM statement ≡ the delete verb
            // (range predicate: SupportsDelete only accepts shapes
            // expressible as v1 source filters — modulo arithmetic
            // is correctly REFUSED, which GraftDmlSpec pins)
            val cut = rnd.nextInt(3000).toLong
            current = current.filter { case (row, _) =>
              row.head.asInstanceOf[Long] > cut }
            spark.sql(
              s"DELETE FROM gmw.`${t.root}` WHERE l_orderkey <= $cut")
            record(t.latestVersion)
          case 12 => // SQL INSERT INTO statement ≡ append
            val (df, m) = slice()
            current = (current.keySet ++ m.keySet).map(k =>
              k -> (current.getOrElse(k, 0) + m.getOrElse(k, 0))).toMap
            df.createOrReplaceTempView("gmw_walk_src")
            spark.sql(s"INSERT INTO gmw.`${t.root}` " +
              "SELECT * FROM gmw_walk_src")
            record(t.latestVersion)
          case 13 => // rename + rename back: two row-neutral commits
            // exercising column mapping MID-history (time travel
            // across the pair must still serve every version)
            record(t.renameColumn("l_quantity", "qty_walk"))
            record(t.renameColumn("qty_walk", "l_quantity"))
        }
      }
      versionRows.toSeq.sortBy(_._1).foreach { case (v, want) =>
        assert(multiset(t.readVersion(v)) == want,
          s"trial $trial: version $v diverged from the model")
      }
      assert(multiset(t.read()) == current,
        s"trial $trial: latest state diverged from the model")
    }
    li.unpersist()
    ()
  }

  test("partitioned tables: flat compact/zorder refuse; compactPartitioned keeps pruning") {
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey", "l_quantity")
    val t = GraftTable.forPath(spark, freshRoot())
    (0 until 3).foreach { i =>
      t.appendPartitioned(li.filter(col("l_orderkey") % 3 === i)
        .withColumn("pb", pmod(col("l_partkey"), lit(4L))), "pb")
    }
    val before = multiset(t.readPartitionedColumn("pb", Seq(0L, 1L, 2L, 3L)).get)
    // a flat rewrite would silently drop the partition paths — refuse
    intercept[IllegalArgumentException] { t.compact(1L << 30) }
    intercept[IllegalArgumentException] {
      t.compactZOrder("l_orderkey", "l_partkey", 4)
    }
    // the partition-aware OPTIMIZE keeps content AND pruned reads
    val filesBefore = t.liveFiles().size
    t.compactPartitioned("pb", 1L << 30)
    assert(t.liveFiles().size < filesBefore, "nothing compacted")
    assert(t.liveFiles().forall(_._1.contains("/pb=")),
      "compacted files lost their partition path")
    assert(multiset(t.readPartitionedColumn("pb", Seq(0L, 1L, 2L, 3L)).get)
      == before, "partitioned compact changed the pruned-read content")
    // single-partition pruned read still selective
    val one = t.readPartitionedColumn("pb", Seq(2L)).get
    assert(one.count() > 0 &&
      one.select("pb").distinct().collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("replace-class commits abort on a concurrent commit (write conflict)") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val a = li.filter(col("l_orderkey") % 2 === 0)
    val b = li.filter(col("l_orderkey") % 2 === 1)
    val t = GraftTable.create(spark, freshRoot(), a)
    // simulate the race deterministically: the overwrite's snapshot is
    // taken, then a concurrent append advances the table before the
    // replacement publishes
    val base = t.latestVersion
    val removes = t.liveFiles().map(_._1)
    t.append(b) // the concurrent commit
    intercept[java.util.ConcurrentModificationException] {
      t.commit("overwrite", Seq.empty, removes, basedOn = Some(base))
    }
    // the table is untouched by the aborted replace
    assert(multiset(t.read()) == multiset(li))
  }

  test("randomized partitioned-op sequences match a per-partition model") {
    // the registry verbs (appendPartitioned / replacePartitions /
    // compactPartitioned) under a seeded random walk, checked against
    // a per-partition-value model — the composition invariant behind
    // every GraftTable-backed streaming sink
    val bd = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity"),
        pmod(col("l_partkey"), lit(4L)).as("pb"))
      .limit(800).cache()
    bd.count()
    val rnd = new scala.util.Random(7)
    def slice(vals: Seq[Long]) = {
      val m = rnd.nextInt(4) + 2; val r = rnd.nextInt(m)
      bd.filter(col("l_orderkey") % m === r && col("pb").isin(vals: _*))
    }
    def byVal(df: org.apache.spark.sql.DataFrame): Map[Long, Map[Seq[Any], Int]] =
      df.collect().map(_.toSeq).groupBy(_.last.asInstanceOf[Long]).view
        .mapValues(_.groupBy(identity).view.mapValues(_.length).toMap).toMap
    (1 to 2).foreach { trial =>
      val t = GraftTable.forPath(spark, freshRoot())
      var model = Map.empty[Long, Map[Seq[Any], Int]]
      def merge(add: Map[Long, Map[Seq[Any], Int]]): Unit =
        model = (model.keySet ++ add.keySet).map { v =>
          val a = model.getOrElse(v, Map.empty)
          val b = add.getOrElse(v, Map.empty)
          v -> (a.keySet ++ b.keySet).map(k =>
            k -> (a.getOrElse(k, 0) + b.getOrElse(k, 0))).toMap
        }.toMap
      (1 to 9).foreach { _ =>
        rnd.nextInt(5) match {
          case 0 => // partitioned append
            val df = slice(Seq(0L, 1L, 2L, 3L))
            merge(byVal(df))
            t.appendPartitioned(df, "pb")
          case 1 => // replace-where on a random value subset
            val vals = (0L to 3L).filter(_ => rnd.nextBoolean()) match {
              case Seq() => Seq(rnd.nextInt(4).toLong)
              case vs => vs
            }
            val df = slice(vals)
            val dfByVal = byVal(df)
            model = model -- vals
            merge(vals.map(v => v -> dfByVal.getOrElse(v, Map.empty)).toMap)
            t.replacePartitions(df, "pb", vals)
          case 2 => // partition-aware OPTIMIZE: content-neutral
            t.compactPartitioned("pb", 1L << 30)
          case 3 if t.latestVersion > 0 => // partition-aware CoW DELETE
            val m = rnd.nextInt(4) + 2; val r = rnd.nextInt(m)
            model = model.map { case (v, rows) =>
              v -> rows.filter { case (row, _) =>
                row.head.asInstanceOf[Long] % m != r }
            }
            t.deleteWhere(col("l_orderkey") % m === r)
          case 4 if t.latestVersion > 0 => // partition-aware CoW UPDATE
            val m = rnd.nextInt(4) + 2; val r = rnd.nextInt(m)
            model = model.map { case (v, rows) =>
              v -> rows.toSeq.map { case (row, n) =>
                (if (row.head.asInstanceOf[Long] % m == r)
                   row.updated(1, row(1).asInstanceOf[Double] + 1.0)
                 else row) -> n
              }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
            }
            t.update(col("l_orderkey") % m === r,
              Map("l_quantity" -> (col("l_quantity") + 1.0)))
          case _ => () // DML on a not-yet-created table: no-op
        }
      }
      val liveVals = model.filter(_._2.nonEmpty).keySet
      // full read equals the merged model
      val wantAll = model.values.foldLeft(Map.empty[Seq[Any], Int]) {
        (acc, m) => (acc.keySet ++ m.keySet).map(k =>
          k -> (acc.getOrElse(k, 0) + m.getOrElse(k, 0))).toMap
      }.filter(_._2 > 0)
      if (wantAll.nonEmpty) {
        val got = t.readPartitionedColumn("pb", Seq(0L, 1L, 2L, 3L)).get
        assert(multiset(got) == wantAll,
          s"trial $trial: full partitioned read diverged from the model")
        // every per-value pruned read equals its slice of the model
        liveVals.foreach { v =>
          val one = t.readPartitionedColumn("pb", Seq(v))
            .map(multiset).getOrElse(Map.empty)
          assert(one == model(v).filter(_._2 > 0),
            s"trial $trial: pruned read of pb=$v diverged")
        }
      }
    }
    bd.unpersist()
    ()
  }

  test("vacuum's grace window spares an in-flight writer's staged files") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val t = GraftTable.create(spark, freshRoot(), li)
    // an in-flight writer: staged seconds ago, commit not yet published
    li.limit(50).write.parquet(t.root + "/data/inflight00000")
    t.vacuum(retainVersions = 1) // default 10-minute grace
    assert(new java.io.File(t.root + "/data/inflight00000").listFiles()
      .exists(_.getName.endsWith(".parquet")),
      "vacuum deleted a fresh in-flight stage inside the grace window")
  }

  test("vacuum reclaims crash-orphaned staged files") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val t = GraftTable.create(spark, freshRoot(), li)
    // a writer that died between staging and publishing: data files
    // exist under data/ but no commit references them
    li.limit(100).write.parquet(t.root + "/data/deadbeef0000")
    val want = multiset(t.read())
    t.vacuum(retainVersions = 1, orphanGraceMillis = 0)
    assert(!new java.io.File(t.root + "/data/deadbeef0000").listFiles()
      .exists(_.getName.endsWith(".parquet")),
      "orphaned staged files survived vacuum")
    assert(multiset(t.read()) == want, "vacuum touched live data")
  }

  test("vacuum deletes only unreferenced files; retained versions still read") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val t = GraftTable.create(spark, freshRoot(),
      li.filter(col("l_orderkey") % 2 === 0).repartition(6))
    t.append(li.filter(col("l_orderkey") % 2 === 1).repartition(6))
    val v3 = t.compact(1L << 30)
    val want = multiset(li)
    val dataFilesBefore = t.liveFiles().size
    t.vacuum(retainVersions = 1, orphanGraceMillis = 0)
    assert(multiset(t.read()) == want, "vacuum broke the latest snapshot")
    assert(t.liveFiles().size == dataFilesBefore)
    // the pre-compact layout is physically gone
    val dataDir = new java.io.File(t.root + "/data")
    val onDisk = dataDir.listFiles().flatMap(_.listFiles())
      .count(f => f.getName.endsWith(".parquet"))
    assert(onDisk == t.liveFiles().size,
      s"vacuum left unreferenced files: $onDisk on disk vs ${t.liveFiles().size} live")
    intercept[IllegalArgumentException] { t.readVersion(v3 - 1) }
    ()
  }
}
