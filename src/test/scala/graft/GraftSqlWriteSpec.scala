package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.GraftTable
import java.nio.file.Files

/** SQL write statements through the catalog: `CREATE TABLE`,
  * `CREATE TABLE AS SELECT`, `INSERT INTO`, `INSERT OVERWRITE` —
  * each landing as atomic commits through the v2 batch write
  * (executor-staged parquet + one driver commit), while
  * `df.write.format("graft")` keeps its v1 atomic-commit fallback.
  */
class GraftSqlWriteSpec extends SparkSpec {

  private def multiset(df: DataFrame) =
    df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap

  private def fresh(tag: String) =
    Files.createTempDirectory(s"graft_$tag").toString + "/t"

  spark.conf.set("spark.sql.catalog.gw",
    classOf[graft.sources.GraftCatalog].getName)

  test("CREATE TABLE + INSERT INTO land as schema commit + one append commit") {
    val root = fresh("sqlins")
    spark.sql(s"CREATE TABLE gw.`$root` (o_orderkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE)")
    val t = GraftTable.forPath(spark, root)
    assert(t.latestVersion == 1 && t.readCommit(1).action == "create")
    assert(t.read().count() == 0 &&
      t.read().schema.fieldNames.toSeq ==
        Seq("o_orderkey", "o_orderstatus", "o_totalprice"))
    // INSERT INTO ... SELECT: one append commit, rows exact
    val src = Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    src.createOrReplaceTempView("sqlins_src")
    spark.sql(s"INSERT INTO gw.`$root` SELECT * FROM sqlins_src")
    assert(t.latestVersion == 2 && t.readCommit(2).action == "append")
    assert(multiset(t.read()) == multiset(src))
    // INSERT INTO ... VALUES appends too
    spark.sql(s"INSERT INTO gw.`$root` VALUES (-1, 'Z', 0.5)")
    assert(t.latestVersion == 3)
    assert(t.read().filter(col("o_orderkey") === -1).count() == 1)
    // the add-actions carry footer stats like every other commit, so
    // log-level skipping works on SQL-inserted data
    assert(t.readCommit(2).adds.forall(_.stats.isDefined))
    assert(t.prunedFiles(col("o_orderkey") === -1).size <
      t.liveFiles().size)
    ()
  }

  test("CREATE TABLE AS SELECT materializes the query into a fresh table") {
    val root = fresh("ctas")
    val want = Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "O")
      .select("o_orderkey", "o_totalprice")
    want.createOrReplaceTempView("ctas_src")
    spark.sql(s"CREATE TABLE gw.`$root` AS " +
      "SELECT o_orderkey, o_totalprice FROM ctas_src")
    val t = GraftTable.forPath(spark, root)
    assert(multiset(t.read()) == multiset(want))
    assert(multiset(spark.sql(s"SELECT * FROM gw.`$root`")) ==
      multiset(want))
    // create + one append
    assert(t.latestVersion == 2)
    // creating over an existing table refuses
    val e = intercept[Throwable] {
      spark.sql(s"CREATE TABLE gw.`$root` (x BIGINT)")
    }
    assert(Option(e.getMessage).exists(m =>
      m.contains("already exists") || m.contains("TABLE_OR_VIEW")), e.getMessage)
    ()
  }

  test("INSERT OVERWRITE replaces the whole live set in one serializable commit") {
    import spark.implicits._
    val root = fresh("sqlovw")
    val t = GraftTable.create(spark, root, Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderstatus", "o_totalprice"))
    val v1Files = t.liveFiles().map(_._1).toSet
    Seq((1L, "A", 1.0), (2L, "B", 2.0))
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
      .createOrReplaceTempView("sqlovw_src")
    spark.sql(s"INSERT OVERWRITE gw.`$root` SELECT * FROM sqlovw_src")
    assert(t.latestVersion == 2 && t.readCommit(2).action == "overwrite")
    assert(t.read().count() == 2)
    assert(t.liveFiles().map(_._1).toSet.intersect(v1Files).isEmpty,
      "overwrite left old files live")
    // time travel still serves the pre-overwrite snapshot
    assert(t.readVersion(1).count() ==
      Tables.orders(spark, sf).count())
    ()
  }

  test("SQL inserts enforce CHECK constraints and schema compatibility") {
    import spark.implicits._
    val root = fresh("sqlck")
    spark.sql(s"CREATE TABLE gw.`$root` (id BIGINT, score BIGINT)")
    spark.sql(s"ALTER TABLE gw.`$root` SET TBLPROPERTIES " +
      "('constraint.pos' = 'score >= 0')")
    val t = GraftTable.forPath(spark, root)
    val v = t.latestVersion
    def chain(x: Throwable): Seq[String] =
      if (x == null) Seq.empty
      else Option(x.getMessage).toSeq ++ chain(x.getCause)
    val e = intercept[Throwable] {
      spark.sql(s"INSERT INTO gw.`$root` VALUES (1, -5)")
    }
    assert(chain(e).mkString(" ").contains("pos"), chain(e).mkString(" | "))
    assert(t.latestVersion == v, "a violating INSERT must not commit")
    assert(t.read().count() == 0)
    // and no staged orphans survive the abort
    val orphans = {
      val dir = new java.io.File(new java.io.File(root), "data")
      def w(f: java.io.File): Seq[java.io.File] =
        if (!f.exists) Seq.empty
        else if (f.isDirectory) f.listFiles().toIndexedSeq.flatMap(w)
        else Seq(f)
      w(dir).filter(_.getName.endsWith(".parquet"))
    }
    assert(orphans.isEmpty, s"violating INSERT left staged files: $orphans")
    // valid insert lands
    spark.sql(s"INSERT INTO gw.`$root` VALUES (1, 5)")
    assert(t.read().count() == 1)
    ()
  }

  test("INSERT OVERWRITE into a renamed + constrained table lands (constraint read uses the staged logical names)") {
    import spark.implicits._
    val root = fresh("ovwcm")
    // v1: create under original names, then RENAME (non-identity
    // column mapping) and add a CHECK constraint
    val t = GraftTable.create(spark, root,
      Seq((1L, 10L), (2L, 20L)).toDF("id", "val0"))
    t.renameColumn("val0", "score")
    t.addConstraint("pos", "score >= 0")
    // overwrite files are staged under the NEW schema's LOGICAL names
    // (the commit resets column mapping); the pre-fix constraint read
    // translated through the OLD mapping, read `score` back all-null,
    // and aborted this valid overwrite with a phantom violation
    Seq((3L, 30L), (4L, 40L)).toDF("id", "score")
      .createOrReplaceTempView("ovwcm_src")
    spark.sql(s"INSERT OVERWRITE gw.`$root` SELECT * FROM ovwcm_src")
    assert(t.read().orderBy("id").collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSeq == Seq((3L, 30L), (4L, 40L)))
    // the constraint still BITES post-overwrite on genuinely bad rows
    Seq((5L, -1L)).toDF("id", "score")
      .createOrReplaceTempView("ovwcm_bad")
    val v = t.latestVersion
    intercept[Throwable] {
      spark.sql(s"INSERT OVERWRITE gw.`$root` SELECT * FROM ovwcm_bad")
    }
    assert(t.latestVersion == v, "violating overwrite must not commit")
    ()
  }

  test("CREATE TABLE LOCATION differing from the identifier path refuses; DDL corners refuse loudly") {
    val root = fresh("loc")
    val e = intercept[Throwable] {
      spark.sql(s"CREATE TABLE gw.`$root` (x BIGINT) LOCATION '/elsewhere/t'")
    }
    def chain(x: Throwable): Seq[String] =
      if (x == null) Seq.empty
      else Option(x.getMessage).toSeq ++ chain(x.getCause)
    assert(chain(e).mkString(" ").contains("LOCATION"),
      chain(e).mkString(" | "))
    assert(GraftTable.forPath(spark, root).latestVersion == 0,
      "refused CREATE must not create the table")
    // a matching LOCATION (Spark's own injected default shape) is fine
    spark.sql(s"CREATE TABLE gw.`$root` (x BIGINT) LOCATION '$root'")
    assert(GraftTable.forPath(spark, root).latestVersion == 1)
    // ADD COLUMN NOT NULL refuses (old files read null — the
    // constraint could never hold); plain nullable add works
    val e2 = intercept[Throwable] {
      spark.sql(s"ALTER TABLE gw.`$root` ADD COLUMN y BIGINT NOT NULL")
    }
    assert(chain(e2).mkString(" ").contains("NOT NULL"),
      chain(e2).mkString(" | "))
    spark.sql(s"ALTER TABLE gw.`$root` ADD COLUMN y BIGINT")
    assert(GraftTable.forPath(spark, root).read()
      .schema.fieldNames.toSeq == Seq("x", "y"))
    ()
  }

  test("introspection table functions: graft_history / graft_files / graft_vacuum_plan") {
    import spark.implicits._
    val root = fresh("tvf")
    val t = GraftTable.create(spark, root, Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice").repartition(4))  // v1
    t.deleteWhere(col("o_orderkey") % 2 === 0)               // v2
    // history as SQL ≡ the API verb
    val h = spark.sql(s"SELECT * FROM graft_history('$root')")
      .orderBy("version").collect()
    assert(h.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "append"), (2L, "delete")))
    // files as SQL: paths/bytes/rows match the log, and the logged
    // row counts sum to the live count
    val f = spark.sql(s"SELECT * FROM graft_files('$root')")
    assert(f.count() == t.liveFiles().size)
    assert(f.agg(sum("n_rows")).head.getLong(0) == t.read().count())
    assert(f.filter(col("has_dv")).count() == 0)
    // the vacuum dry run as SQL: with the DEFAULT grace (the verb's
    // 10 minutes) the seconds-old replaced files are NOT yet listed —
    // the dry run agrees with what GRAFT VACUUM would delete right
    // now, and never lists an in-flight writer's staged data
    val before = t.liveFiles()
    val vpDefault = spark.sql(
      s"SELECT * FROM graft_vacuum_plan('$root', 1)").collect()
    assert(!vpDefault.exists(_.getString(0) == "file"),
      "default-grace dry run listed seconds-old files as reclaimable")
    assert(vpDefault.exists(_.getString(0) == "commit"))
    // an explicit zero grace (third argument, millis) shows the full
    // eventual reclaim set
    val vp = spark.sql(
      s"SELECT * FROM graft_vacuum_plan('$root', 1, 0)").collect()
    assert(vp.exists(_.getString(0) == "file"),
      "replaced v1 files should be reclaimable at grace 0")
    assert(vp.exists(_.getString(0) == "commit"))
    assert(t.liveFiles() == before, "the dry run must reclaim nothing")
    assert(t.readVersion(1).count() > 0, "dry run deleted nothing")
    ()
  }

  test("the path-based format keeps the v1 atomic write; time-travel snapshots refuse inserts") {
    import spark.implicits._
    val root = fresh("sqlv1")
    // df.write must still ride createRelation (v1): one append commit
    Seq((1L, "x")).toDF("k", "s").write.format("graft").save(root)
    val t = GraftTable.forPath(spark, root)
    assert(t.latestVersion == 1 && t.readCommit(1).action == "append")
    // INSERT into VERSION AS OF is refused (not an insert target)
    spark.sql(s"INSERT INTO gw.`$root` VALUES (2, 'y')")
    val e = intercept[Throwable] {
      spark.sql(s"INSERT INTO gw.`$root` VERSION AS OF 1 VALUES (3, 'z')")
    }
    assert(e != null)
    assert(t.read().count() == 2)
    ()
  }

  test("CREATE TABLE PARTITIONED BY + INSERT INTO stage dynamic partitions; OVERWRITE replaces") {
    import spark.implicits._
    val root = fresh("sqlpart")
    spark.sql(s"CREATE TABLE gw.`$root` (id BIGINT, payload STRING, " +
      "country STRING, day DATE) PARTITIONED BY (country, day)")
    val t = GraftTable.forPath(spark, root)
    assert(t.partMetaAt(1).map(p => (p.col, p.tpe.catalogString)) ==
      Seq(("country", "string"), ("day", "date")))
    // payload schema excludes the keys; the catalog table serves all
    assert(t.readVersion(1).columns.toSeq == Seq("id", "payload"))
    assert(spark.table(s"gw.`$root`").columns.toSet ==
      Set("id", "payload", "country", "day"))
    // dynamic-partition INSERT: rows route under escaped value dirs
    spark.sql(s"INSERT INTO gw.`$root` VALUES " +
      "(1, 'a', 'India', DATE'2026-01-01'), " +
      "(2, 'b', 'a=b',   DATE'2026-01-01'), " +
      "(3, 'c', 'India', DATE'2027-06-15'), " +
      "(4, 'd', null,    DATE'2026-01-01')")
    val rels = t.liveFiles().map(_._1)
    assert(rels.forall(r => r.contains("/country=") && r.contains("/day=")),
      rels)
    assert(rels.exists(_.contains("/country=a%3Db/")), rels)
    assert(rels.exists(_.contains("__HIVE_DEFAULT_PARTITION__")), rels)
    // the read restores both keys (null row included)
    val got = spark.table(s"gw.`$root`")
    assert(got.count() == 4)
    assert(got.filter(col("country").isNull).head.getAs[Long]("id") == 4L)
    assert(got.filter(col("day") === java.sql.Date.valueOf("2027-06-15"))
      .head.getAs[Long]("id") == 3L)
    // pruned subset readers work against the SQL-landed layout
    assert(t.readPartitionedColumnString("country", Seq("India")).get
      .count() == 2)
    // a by-name insert omitting a key: Spark null-fills the column,
    // which legally lands under the sentinel dir as a NULL key
    spark.sql(s"INSERT INTO gw.`$root` (id, payload, country) " +
      "VALUES (9, 'x', 'ZA')")
    assert(spark.table(s"gw.`$root`")
      .filter(col("id") === 9).head.getAs[java.sql.Date]("day") == null)
    // INSERT OVERWRITE replaces the whole live set, layout preserved
    spark.sql(s"INSERT OVERWRITE gw.`$root` VALUES " +
      "(7, 'z', 'ZA', DATE'2026-02-02')")
    assert(spark.table(s"gw.`$root`").collect().map(_.getLong(0)).toSeq ==
      Seq(7L))
    assert(t.partMetaAt(t.latestVersion).map(_.col) ==
      Seq("country", "day"))
    assert(t.liveFiles().map(_._1).forall(_.contains("/country=ZA/")))
    ()
  }

  test("writeStream.format(graft) stages partitioned epochs into a partitioned table") {
    import spark.implicits._
    val root = fresh("streampart")
    spark.sql(s"CREATE TABLE gw.`$root` (id BIGINT, payload STRING, " +
      "country STRING) PARTITIONED BY (country)")
    val t = GraftTable.forPath(spark, root)
    val dir = Files.createTempDirectory("graft_sp_src").toString
    Seq((1L, "x", "IN"), (2L, "y", "ZA"), (3L, "z", "IN"))
      .toDF("id", "payload", "country")
      .write.mode("overwrite").parquet(dir)
    val src = spark.readStream
      .schema("id BIGINT, payload STRING, country STRING").parquet(dir)
    val q = src.writeStream.format("graft")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_sp_ck").toString)
      .start(root)
    try q.processAllAvailable() finally q.stop()
    assert(t.liveFiles().map(_._1).forall(_.contains("/country=")),
      t.liveFiles().map(_._1))
    assert(t.readPartitionedColumnString("country", Seq("IN")).get
      .count() == 2)
    assert(spark.read.format("graft").load(root).columns.toSet ==
      Set("id", "payload", "country"))
    ()
  }

  test("partitioned CTAS: CREATE TABLE ... PARTITIONED BY ... AS SELECT lands dynamic partitions") {
    import spark.implicits._
    val root = fresh("sqlctaspart")
    Seq((1L, "a", "IN"), (2L, "b", "ZA"), (3L, "c", "IN"))
      .toDF("id", "payload", "country")
      .createOrReplaceTempView("ctas_part_src")
    spark.sql(s"CREATE TABLE gw.`$root` PARTITIONED BY (country) " +
      "AS SELECT * FROM ctas_part_src")
    val t = GraftTable.forPath(spark, root)
    assert(t.partMetaAt(1).map(_.col) == Seq("country"))
    assert(t.liveFiles().map(_._1).forall(_.contains("/country=")),
      t.liveFiles().map(_._1))
    assert(t.readPartitionedColumnString("country", Seq("IN")).get
      .count() == 2)
    assert(spark.table(s"gw.`$root`").count() == 3)
    ()
  }
}
