package graft

import org.apache.spark.sql.functions._
import graft.sources.GraftTable
import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

/** Regression pins for the round-11 soundness fixes:
  *   - bloom index keyed by the two-component file key (a basename
  *     collides across the value dirs of one PARTITIONED write job,
  *     so keying blooms by basename could prune a file that contains
  *     the queried value — rows silently vanishing from reads);
  *   - string stats compared in unsigned UTF-8 byte order (parquet's
  *     order) — UTF-16 `compareTo` diverges for supplementary-plane
  *     characters and could prune a file containing a matching string;
  *   - DSv2 read of a legitimately EMPTY table (post-TRUNCATE) serves
  *     an empty frame under the recorded schema instead of failing
  *     parquet inference over zero paths;
  *   - partitioned append/replace validate payload-schema
  *     compatibility instead of silently re-recording the schema;
  *   - append re-derives its recorded schema against the WINNING
  *     predecessor, so schema evolution is monotone under concurrency;
  *   - the p7 lifecycle build is single-winner and self-auditing
  *     under concurrent driver-style invocation.
  */
class SoundnessFixSpec extends SparkSpec {

  private def multiset(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap

  private def fresh(tag: String) =
    Files.createTempDirectory(s"graft_$tag").toString + "/t"

  test("bloom index on a hive-partitioned table prunes by file key, never the wrong file's bloom") {
    import spark.implicits._
    // 4 tasks × 4 value dirs: every dir holds part files whose
    // BASENAMES repeat across dirs (same job uuid, same part numbers)
    val df = spark.range(4000)
      .select(col("id").as("k"), pmod(col("id"), lit(4)).as("bucket"),
        (col("id") * 37 % 1000).as("v"))
      .repartition(4)
    val root = fresh("bloompart")
    val t = GraftTable.forPath(spark, root)
    t.appendPartitioned(df, "bucket")
    t.setBloomIndex(Seq("k"))
    t.appendPartitioned(df.withColumn("k", col("k") + 4000), "bucket")
    val total = t.liveFiles().size
    assert(total >= 8, s"wanted basename-colliding files, got $total")
    // duplicate basenames must actually occur or the pin is vacuous
    val basenames = t.liveFiles().map(_._1.split("/").last)
    assert(basenames.distinct.size < basenames.size,
      "partitioned staging no longer collides basenames; re-shape the spec")
    // every indexed-era key must be served: a wrong-file bloom would
    // prune the containing file and silently drop the row
    val keys = Seq(4000L, 4001L, 5555L, 7999L, 6000L)
    keys.foreach { k =>
      assert(multiset(t.readWhere(col("k") === k)) ==
        multiset(t.read().filter(col("k") === k)),
        s"bloom-pruned read diverged for key $k")
      assert(t.readWhere(col("k") === k).count() == 1L)
    }
    // and the index still prunes: an indexed point lookup plans fewer
    // files than the table holds
    assert(t.prunedFiles(col("k") === 5555L).size < total)
  }

  test("string stats prune in UTF-8 byte order: supplementary-plane max cannot hide a BMP match") {
    import spark.implicits._
    // "😀" (U+1F600) sorts ABOVE "￿" in UTF-8 (parquet's stats
    // order) but BELOW it in UTF-16 — a compareTo-based evaluator
    // concludes hi < "￿" and prunes the file containing it
    val root = fresh("utf8")
    val t = GraftTable.create(spark, root,
      Seq(("A", 1L), ("￿", 2L), ("😀", 3L)).toDF("s", "n"))
    assert(t.readWhere(col("s") === "￿").count() == 1L)
    assert(t.readWhere(col("s") === "😀").count() == 1L)
    assert(t.readWhere(col("s").startsWith("￿")).count() == 1L)
    assert(t.prunedFiles(col("s") === "￿").nonEmpty,
      "the containing file was stats-pruned (UTF-16 ordering bug)")
    // pruning is still live for genuinely out-of-range literals
    assert(t.prunedFiles(col("s") === "0").isEmpty)
  }

  test("DSv2 read of a truncated table serves an empty frame under the recorded schema") {
    import spark.implicits._
    val root = fresh("empty")
    val t = GraftTable.create(spark, root,
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    t.deleteWhere(lit(true))
    assert(t.latestVersion >= 2 && t.liveFiles().isEmpty)
    val got = spark.read.format("graft").load(root)
    assert(got.count() == 0L)
    assert(got.schema.fieldNames.toSet == Set("id", "s"))
    // and SQL over it works too
    got.createOrReplaceTempView("soundness_empty")
    assert(spark.sql("SELECT count(*) FROM soundness_empty").head().getLong(0) == 0L)
  }

  test("partitioned append/replace refuse incompatible payload schemas instead of re-recording") {
    import spark.implicits._
    val root = fresh("partschema")
    val t = GraftTable.forPath(spark, root)
    val base = spark.range(100)
      .select(col("id").as("k"), pmod(col("id"), lit(4)).as("bucket"),
        col("id").cast("string").as("s"))
    t.appendPartitioned(base, "bucket")
    // renamed payload column
    intercept[IllegalArgumentException] {
      t.appendPartitioned(base.withColumnRenamed("s", "t"), "bucket")
    }
    // retyped payload column
    intercept[IllegalArgumentException] {
      t.replacePartitions(
        base.filter(col("bucket") === 1)
          .withColumn("k", col("k").cast("int")), "bucket", Seq(1L))
    }
    // the recorded schema survived both refusals
    assert(t.read().schema.fieldNames.toSet == Set("k", "s"))
  }

  test("concurrent appends and mergeSchema widens keep the recorded schema monotone") {
    import spark.implicits._
    val root = fresh("schemarace")
    val t = GraftTable.create(spark, root, Seq((1L, "x")).toDF("a", "b"))
    val narrow = Seq((2L, "y")).toDF("a", "b")
    val wide = Seq((3L, "z", 9L)).toDF("a", "b", "c")
    val pool = Executors.newFixedThreadPool(8)
    val start = new CountDownLatch(1)
    val jobs = (0 until 8).map { i =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          try {
            if (i % 2 == 0) t.append(narrow)
            else t.append(wide, mergeSchema = true)
          } catch {
            // a narrow append that loses to a widen must ABORT, never
            // commit the stale narrower schema at a later version
            case _: IllegalArgumentException => ()
          }
          ()
        }
      })
    }
    start.countDown()
    jobs.foreach(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    // monotone field sets across the whole log: once 'c' appears it
    // can never vanish from a later version's recorded schema
    val vs = (1L to t.latestVersion)
    val fieldSets = vs.map(v => t.schemaAt(v).get.fieldNames.toSet)
    fieldSets.sliding(2).foreach {
      case Seq(prev, next) => assert(prev.subsetOf(next),
        s"schema narrowed across versions: $prev -> $next")
      case _ => ()
    }
    assert(fieldSets.last.contains("c"))
    // every row reads under the final schema; pre-widen files null 'c'
    val all = t.read()
    assert(all.schema.fieldNames.toSet == Set("a", "b", "c"))
    assert(all.count() >= 1L)
  }

  test("p7 lifecycle is single-winner and identical under concurrent driver-style invocation") {
    val pool = Executors.newFixedThreadPool(3)
    val start = new CountDownLatch(1)
    val results = (0 until 3).map { _ =>
      pool.submit(new java.util.concurrent.Callable[Seq[Seq[Any]]] {
        override def call(): Seq[Seq[Any]] = {
          start.await()
          graft.operators.Pipeline.p7LakehouseCorpus(spark, sf)
            .collect().toSeq.map(_.toSeq)
        }
      })
    }
    start.countDown()
    val got = results.map(_.get(300, TimeUnit.SECONDS))
    pool.shutdown()
    assert(got.distinct.size == 1, "concurrent p7 invocations diverged")
    assert(got.head.nonEmpty)
  }
}
