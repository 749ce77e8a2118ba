package graft

import org.apache.spark.sql.functions._
import graft.sources.GraftTable
import java.nio.file.Files

/** The `GRAFT …` maintenance-statement family (injected parser →
  * runnable commands): VACUUM (dry run lists without deleting;
  * execution reclaims exactly the listed plan), OPTIMIZE (compacts
  * undersized files in one commit, content-neutral), CLONE (the
  * shallow-clone statement), GENERATE MANIFEST (readback parity +
  * the verb's refusals), the loud unknown-GRAFT error, and the
  * fall-through contract (ordinary SQL parses untouched).
  */
class GraftSqlCommandSpec extends SparkSpec {

  private def multiset(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap

  private def freshRoot(tag: String) =
    Files.createTempDirectory(s"graft_sqlcmd_$tag").toString + "/t"

  private def orders() = Tables.orders(spark, sf)
    .select("o_orderkey", "o_orderstatus", "o_totalprice")

  test("GRAFT VACUUM: DRY RUN lists without deleting; execution reclaims the plan") {
    val root = freshRoot("vac")
    val t = GraftTable.create(spark, root, orders().repartition(4))
    t.overwrite(orders().filter(col("o_orderstatus") === "P")) // v2: v1 files dead
    val want = multiset(t.read())
    // the statement keeps the VERB's 10-minute orphan grace (a fresh
    // file is never reclaimable) — age the dead v1 files so the dry
    // run can list them, as time would in production
    val aged = System.currentTimeMillis() - 11 * 60 * 1000
    def walk(f: java.io.File): Unit =
      if (f.isDirectory) f.listFiles().foreach(walk)
      else if (f.getName.endsWith(".parquet")) { f.setLastModified(aged); () }
    walk(new java.io.File(root))
    val dry = spark.sql(s"GRAFT VACUUM '$root' RETAIN 1 VERSIONS DRY RUN")
      .collect()
    assert(dry.exists(_.getString(0) == "file"),
      "dry run should list the overwritten files")
    // nothing deleted: time travel to v1 still works
    assert(t.readVersion(1).count() > 0, "DRY RUN deleted files")
    val exec = spark.sql(s"GRAFT VACUUM '$root' RETAIN 1 VERSIONS").collect()
    assert(exec.nonEmpty)
    intercept[Exception] { t.readVersion(1).count() } // horizon dropped
    assert(multiset(t.read()) == want, "VACUUM changed live content")
  }

  test("GRAFT OPTIMIZE compacts undersized files content-neutrally") {
    val root = freshRoot("opt")
    val t = GraftTable.create(spark, root, orders().repartition(8))
    val want = multiset(t.read())
    val before = t.liveFiles().size
    val v = spark.sql(s"GRAFT OPTIMIZE '$root'").collect().head.getLong(0)
    assert(v == 2, s"OPTIMIZE should commit v2, got v$v")
    assert(t.liveFiles().size < before, "OPTIMIZE did not reduce file count")
    assert(multiset(t.read()) == want, "OPTIMIZE changed content")
  }

  test("GRAFT CLONE / GENERATE MANIFEST route into the verbs, refusals intact") {
    val srcRoot = freshRoot("csrc")
    val t = GraftTable.create(spark, srcRoot, orders())
    val want = multiset(t.read())
    val dst = freshRoot("cdst")
    val row = spark.sql(s"GRAFT CLONE '$srcRoot' TO '$dst'").collect().head
    assert(row.getLong(0) == 1L && row.getString(1) == dst)
    assert(multiset(GraftTable.forPath(spark, dst).read()) == want)
    val mf = spark.sql(s"GRAFT GENERATE MANIFEST FOR '$dst'")
      .collect().head.getString(0)
    val paths = scala.io.Source.fromFile(mf).getLines().toSeq
    assert(multiset(spark.read.parquet(paths: _*)) == want)
    // the verb's dv refusal surfaces through the statement
    t.deleteWhere(pmod(col("o_orderkey"), lit(5)) === 1, mor = true)
    val e = intercept[Exception] {
      spark.sql(s"GRAFT GENERATE MANIFEST FOR '$srcRoot'").collect() }
    assert(e.getMessage.contains("deletionVectors"))
  }

  test("GRAFT OPTIMIZE ZORDER BY re-clusters content-neutrally") {
    val root = freshRoot("zord")
    val t = GraftTable.create(spark, root,
      orders().withColumn("k2", pmod(col("o_orderkey"), lit(97L)))
        .repartition(8))
    val want = multiset(t.read())
    val v = spark
      .sql(s"GRAFT OPTIMIZE '$root' ZORDER BY (o_orderkey, k2) FILES 4")
      .collect().head.getLong(0)
    assert(v == 2, s"ZORDER should commit v2, got v$v")
    assert(multiset(t.read()) == want, "ZORDER changed content")
    assert(t.liveFiles().size <= 4, "FILES bound not honored")
  }

  test("unknown GRAFT statements fail loudly; ordinary SQL falls through") {
    val e = intercept[IllegalArgumentException] {
      spark.sql("GRAFT FROBNICATE '/x'") }
    assert(e.getMessage.contains("unrecognized GRAFT statement"))
    // the wrapper delegates everything else verbatim
    assert(spark.sql("SELECT 1 + 1 AS two").head.getInt(0) == 2)
    assert(spark.sql("SELECT 'graft vacuum' AS s").head.getString(0)
      == "graft vacuum") // only statement POSITION claims the prefix
  }

  test("VACUUM rejects fractional RETAIN n VERSIONS (ADVICE r13); fractional HOURS stays legal") {
    val e = intercept[IllegalArgumentException] {
      spark.sql("GRAFT VACUUM '/tmp/nowhere' RETAIN 1.5 VERSIONS DRY RUN")
    }
    assert(e.getMessage.contains("not integral"), e.getMessage)
    // the HOURS unit legitimately takes a fractional window — parse
    // must succeed (the statement then runs against a real table)
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_vacfrac").toString + "/t"
    graft.sources.GraftTable.create(spark, root,
      Seq((1, "a")).toDF("k", "v"))
    val rows = spark.sql(
      s"GRAFT VACUUM '$root' RETAIN 0.5 HOURS DRY RUN").collect()
    assert(!rows.exists(_.getString(0) == "commit"))
    ()
  }
}
