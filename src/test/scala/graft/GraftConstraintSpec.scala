package graft

import org.apache.spark.sql.functions._
import graft.sources.GraftTable
import java.nio.file.Files

/** CHECK constraints on GraftTable (Delta's ADD CONSTRAINT … CHECK):
  * recorded in the commit log like the schema, enforced on every
  * write verb before staging, validated against existing data at add
  * time, and durable across reopen / checkpoints / vacuum.
  */
class GraftConstraintSpec extends SparkSpec {

  private def freshRoot() =
    Files.createTempDirectory("graft_cons").toString + "/t"

  private def registry() = Tables.orders(spark, sf)
    .select("o_orderkey", "o_orderstatus", "o_totalprice")

  test("addConstraint validates existing data; writes enforce; drop releases") {
    val t = GraftTable.create(spark, freshRoot(), registry())
    // a constraint existing rows violate must be refused outright
    val e = intercept[IllegalArgumentException] {
      t.addConstraint("pricey", "o_totalprice > 100000")
    }
    assert(e.getMessage.contains("existing rows violate"))
    assert(t.constraints().isEmpty && t.read().count() == registry().count())
    // a valid one records as a metadata-only commit
    val v = t.addConstraint("pos_price", "o_totalprice > 0")
    assert(t.constraints() == Map("pos_price" -> "o_totalprice > 0"))
    assert(t.readCommit(v).action == "constraint:add:pos_price" &&
      t.readCommit(v).adds.isEmpty)
    // clean append passes, violating append aborts with NO commit
    t.append(registry().limit(50))
    val before = t.latestVersion
    val bad = registry().limit(20)
      .withColumn("o_totalprice", -col("o_totalprice"))
    val e2 = intercept[IllegalArgumentException] { t.append(bad) }
    assert(e2.getMessage.contains("pos_price"))
    assert(t.latestVersion == before, "violating append left a commit")
    // NULLs violate (SQL CHECK accepts only TRUE)
    intercept[IllegalArgumentException] {
      t.append(registry().limit(5)
        .withColumn("o_totalprice", lit(null).cast("double")))
    }
    // merge post-images enforce too
    val badUpd = registry().limit(10)
      .select(col("o_orderkey"), (-col("o_totalprice")).as("o_totalprice"))
    intercept[IllegalArgumentException] { t.merge(badUpd, "o_orderkey") }
    // drop releases: the same batch now lands
    t.dropConstraint("pos_price")
    assert(t.constraints().isEmpty)
    t.append(bad)
    assert(t.read().filter(col("o_totalprice") < 0).count() == 20)
    // the full lifecycle is auditable in history
    val actions = t.history().orderBy("version").collect()
      .map(_.getAs[String]("action")).toSeq
    assert(actions.contains("constraint:add:pos_price") &&
      actions.contains("constraint:drop:pos_price"))
  }

  test("constraints survive reopen, checkpoints and vacuum") {
    val root = freshRoot()
    val t = GraftTable.create(spark, root, registry())
    t.addConstraint("pos_price", "o_totalprice > 0")
    // drive past the checkpoint boundary (every 8 commits) and vacuum
    (1 to 8).foreach(i => t.append(registry().limit(10 + i)))
    t.vacuum(retainVersions = 1, orphanGraceMillis = 0)
    // a FRESH handle (cold caches) still enforces
    val t2 = GraftTable.forPath(spark, root)
    assert(t2.constraints() == Map("pos_price" -> "o_totalprice > 0"),
      "vacuum/checkpoint lost the constraint set")
    intercept[IllegalArgumentException] {
      t2.append(registry().limit(3)
        .withColumn("o_totalprice", -col("o_totalprice")))
    }
    ()
  }

  test("constraint commits are row-neutral for the change feeds and the stream") {
    val li = registry()
    val root = freshRoot()
    val t = GraftTable.create(spark, root,
      li.filter(col("o_orderkey") % 2 === 0))          // v1
    t.addConstraint("pos_price", "o_totalprice > 0")   // v2: metadata only
    t.append(li.filter(col("o_orderkey") % 2 === 1))   // v3
    // batch feeds serve across the metadata commit, contributing no rows
    assert(t.changesSince(1).get.count() ==
      li.filter(col("o_orderkey") % 2 === 1).count())
    val feed = t.changeFeed(1).get
    assert(feed.filter(col("_commit_version") === 2).count() == 0)
    // the streaming source drains the range without dying
    val out = Files.createTempDirectory("graft_cons_out").toString
    val q = spark.readStream.format("graft").load(root)
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("graft_cons_ck").toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        b.write.mode("overwrite").parquet(s"$out/b$id")
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.read.parquet(s"$out/b0").count() == li.count())
  }
}
