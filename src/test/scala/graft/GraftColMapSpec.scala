package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.{GraftTable, HeaderMapper}
import java.nio.file.Files

/** COLUMN MAPPING (Delta's column-mapping feature): rename/drop as
  * metadata-only commits over a logical→physical name indirection.
  * Files are never rewritten; old versions time-travel under their
  * epoch-correct names; DML, stats skipping and the streaming sink
  * keep working through the mapping; dropped data can never
  * resurrect under a re-added name.
  */
class GraftColMapSpec extends SparkSpec {

  private def multiset(df: DataFrame) =
    df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap

  private def fresh(tag: String) =
    Files.createTempDirectory(s"graft_$tag").toString + "/t"

  private def seed(): DataFrame = Tables.orders(spark, sf)
    .select("o_orderkey", "o_orderstatus", "o_totalprice")
    .repartitionByRange(6, col("o_orderkey"))

  test("rename is metadata-only: zero files touched, epoch-correct time travel, DML and skipping intact") {
    val root = fresh("rename")
    val t = GraftTable.create(spark, root, seed())          // v1
    val filesV1 = t.liveFiles().map(_._1).toSet
    t.renameColumn("o_totalprice", "price_usd")             // v2
    assert(t.liveFiles().map(_._1).toSet == filesV1,
      "rename touched data files — it must be metadata-only")
    assert(t.read().schema.fieldNames.toSeq ==
      Seq("o_orderkey", "o_orderstatus", "price_usd"))
    // values identical, name changed
    assert(multiset(t.read().withColumnRenamed("price_usd", "o_totalprice"))
      == multiset(seed()))
    // time travel returns the OLD name at the old version
    assert(t.readVersion(1).schema.fieldNames.toSeq ==
      Seq("o_orderkey", "o_orderstatus", "o_totalprice"))
    // appends under the NEW logical name land in the same table
    val extraKey = Tables.orders(spark, sf)
      .agg(max("o_orderkey")).head.getLong(0) + 1
    import spark.implicits._
    t.append(Seq((extraKey, "Z", 9.99))
      .toDF("o_orderkey", "o_orderstatus", "price_usd"))    // v3
    assert(t.read().filter(col("price_usd") === 9.99).count() == 1)
    // stats skipping prunes through the mapping (predicate on the
    // RENAMED column against stats keyed by the physical name)
    val keyMax = extraKey - 1
    val pruned = t.prunedFiles(col("o_orderkey") <= keyMax / 10)
    assert(pruned.nonEmpty && pruned.size < t.liveFiles().size,
      s"skipping dead after rename: ${pruned.size} of ${t.liveFiles().size}")
    // copy-on-write DML through the renamed column
    t.update(col("price_usd") === 9.99,
      Map("price_usd" -> lit(1.0), "o_orderstatus" -> lit("Y"))) // v4
    assert(t.read().filter(col("o_orderstatus") === "Y")
      .select("price_usd").head.getDouble(0) == 1.0)
    t.deleteWhere(col("o_orderkey") === extraKey)           // v5
    assert(t.read().count() == seed().count())
    // rename BACK restores identity mapping
    t.renameColumn("price_usd", "o_totalprice")             // v6
    assert(t.columnMapping().forall { case (l, p) => l == p })
    assert(multiset(t.read()) == multiset(seed()))
    ()
  }

  test("drop tombstones the physical column: a re-added name never resurrects old data") {
    import spark.implicits._
    val root = fresh("drop")
    val t = GraftTable.create(spark, root,
      Seq((1L, "secret1", 10L), (2L, "secret2", 20L))
        .toDF("id", "payload", "score"))                    // v1
    t.dropColumn("payload")                                 // v2
    assert(t.read().schema.fieldNames.toSeq == Seq("id", "score"))
    // time travel still shows the dropped column at v1
    assert(t.readVersion(1).schema.fieldNames.contains("payload"))
    // re-add the SAME logical name via additive evolution
    t.append(Seq((3L, 30L, "fresh3")).toDF("id", "score", "payload"),
      mergeSchema = true)                                   // v3
    val back = t.read().orderBy("id").collect()
    assert(back.length == 3)
    // rows 1/2 predate the re-add: their payload MUST be null — the
    // tombstone maps the new logical 'payload' to a fresh physical
    // column the old files do not contain
    val byId = back.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).isNullAt(back.head.fieldIndex("payload")),
      "dropped data resurrected under a re-added column name")
    assert(byId(2L).isNullAt(back.head.fieldIndex("payload")))
    assert(byId(3L).getString(back.head.fieldIndex("payload")) == "fresh3")
    ()
  }

  test("reader-feature gate: raw DSv2 path refuses a mapped table and reopens at identity") {
    val root = fresh("gate")
    val t = GraftTable.create(spark, root, seed())
    t.renameColumn("o_orderstatus", "status")
    val e = intercept[Throwable] {
      spark.read.format("graft").load(root).count()
    }
    def chain(x: Throwable): Seq[String] =
      if (x == null) Seq.empty
      else Option(x.getMessage).toSeq ++ chain(x.getCause)
    assert(chain(e).mkString(" ").contains("columnMapping"),
      s"wrong refusal: ${chain(e)}")
    // the verb path serves it fine
    assert(t.read().columns.contains("status"))
    // renaming back restores the identity mapping and the raw path
    t.renameColumn("status", "o_orderstatus")
    assert(spark.read.format("graft").load(root).count() == seed().count())
    ()
  }

  test("rename/drop refusals: constraint references, last column") {
    import spark.implicits._
    val root2 = fresh("refuse2")
    val t2 = GraftTable.create(spark, root2,
      Seq((1L, 5L)).toDF("id", "score"))
    t2.addConstraint("pos_score", "score >= 0")
    intercept[IllegalArgumentException](t2.renameColumn("score", "pts"))
    intercept[IllegalArgumentException](t2.dropColumn("score"))
    t2.dropConstraint("pos_score")
    t2.renameColumn("score", "pts") // allowed once the constraint is gone
    t2.dropColumn("id")             // fine: one column remains
    intercept[IllegalArgumentException](t2.dropColumn("pts")) // last col
    ()
  }

  test("restore across a rename boundary returns epoch-correct names") {
    val root = fresh("restore")
    val t = GraftTable.create(spark, root, seed())          // v1
    t.renameColumn("o_totalprice", "price_usd")             // v2
    t.deleteWhere(col("o_orderkey") % 7 === 0)              // v3
    t.restore(1)                                            // v4: pre-rename
    assert(t.read().schema.fieldNames.toSeq ==
      Seq("o_orderkey", "o_orderstatus", "o_totalprice"),
      "restore must reinstate the restored version's column names")
    assert(multiset(t.read()) == multiset(seed()))
    ()
  }

  test("streaming sink stages physical names: writeStream into a renamed table") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_cm_sink")
    val root = dir.resolve("t").toString
    import spark.implicits._
    val t = GraftTable.create(spark, root,
      Seq((-1L, 0.0)).toDF("l_orderkey", "l_quantity"))
    t.renameColumn("l_quantity", "qty")
    // land one parquet slice as the file-stream source
    val src = dir.resolve("src")
    Files.createDirectory(src)
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity").as("qty")).limit(500)
    val stageDir = dir.resolve("stage").toString
    li.coalesce(1).write.parquet(stageDir)
    val part = new java.io.File(stageDir).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, src.resolve("slice0.parquet"))
    val schema = StructType(Seq(StructField("l_orderkey", LongType),
      StructField("qty", DoubleType)))
    val q = spark.readStream.schema(schema).parquet(src.toString)
      .writeStream.format("graft")
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .start(root)
    try q.processAllAvailable() finally q.stop()
    assert(t.read().count() == 501)
    assert(multiset(t.read().filter(col("l_orderkey") =!= -1L)) ==
      multiset(li), "streamed rows lost through the mapping")
    ()
  }

  test("SQL ALTER TABLE DDL routes into metadata-only commits") {
    import spark.implicits._
    val root = fresh("ddl")
    val t = GraftTable.create(spark, root,
      Seq((1L, "a", 10.0), (2L, "b", 20.0))
        .toDF("tag_no", "description", "price"))            // v1
    spark.conf.set("spark.sql.catalog.gddl",
      classOf[graft.sources.GraftCatalog].getName)
    val files = t.liveFiles().map(_._1).toSet
    spark.sql(s"ALTER TABLE gddl.`$root` RENAME COLUMN description TO item_desc")
    spark.sql(s"ALTER TABLE gddl.`$root` ADD COLUMN qty BIGINT")
    assert(t.read().schema.fieldNames.toSeq ==
      Seq("tag_no", "item_desc", "price", "qty"))
    assert(t.read().filter(col("qty").isNull).count() == 2,
      "existing rows must read null in an ALTER-added column")
    spark.sql(s"ALTER TABLE gddl.`$root` DROP COLUMN price")
    assert(t.read().schema.fieldNames.toSeq ==
      Seq("tag_no", "item_desc", "qty"))
    assert(t.liveFiles().map(_._1).toSet == files,
      "ALTER DDL must be metadata-only — it touched data files")
    // CHECK constraints through the property convention
    spark.sql(s"ALTER TABLE gddl.`$root` SET TBLPROPERTIES " +
      "('constraint.has_tag' = 'tag_no > 0')")
    assert(t.constraints() == Map("has_tag" -> "tag_no > 0"))
    intercept[IllegalArgumentException] {
      t.append(Seq((-5L, "x", 1L)).toDF("tag_no", "item_desc", "qty"))
    }
    spark.sql(s"ALTER TABLE gddl.`$root` UNSET TBLPROPERTIES " +
      "('constraint.has_tag')")
    assert(t.constraints().isEmpty)
    // unsupported DDL refuses loudly, the table untouched
    val v = t.latestVersion
    val e = intercept[Throwable] {
      spark.sql(s"ALTER TABLE gddl.`$root` ALTER COLUMN qty TYPE INT")
    }
    def chain(x: Throwable): Seq[String] =
      if (x == null) Seq.empty
      else Option(x.getMessage).toSeq ++ chain(x.getCause)
    val msg = chain(e).mkString(" ").toLowerCase
    assert(msg.contains("not supported") || msg.contains("cannot") ||
      msg.contains("supported ddl"), chain(e).mkString(" | "))
    assert(t.latestVersion == v)
    ()
  }

  test("the HeaderMapper upload flow survives a registry column rename") {
    import spark.implicits._
    // the reference's motivating scenario (map_excel_to_db_columns,
    // app.py:5999): the registry's column gets renamed upstream; the
    // next workbook upload must still land on it — fuzzy headers map
    // to the RENAMED registry schema and the merge commits through
    // the mapping with zero old files rewritten
    val root = fresh("headermap")
    val t = GraftTable.create(spark, root,
      Seq((100L, "old desc", "A"), (200L, "keep", "B"))
        .toDF("tag_no", "description", "status"))
    t.renameColumn("description", "item_description")
    val targets = t.read().schema.fieldNames.toSeq
    val headers = Seq("Tag No.", "Item  Description", "STATUS")
    val m = HeaderMapper.mapHeaders(headers, targets, Some("tag_no"))
    assert(m("Tag No.") == "tag_no" &&
      m("Item  Description") == "item_description" && m("STATUS") == "status")
    val upload = Seq((100L, "new desc", "A"), (300L, "brand new", "C"))
      .toDF("Tag No.", "Item  Description", "STATUS")
    val renamed = m.foldLeft(upload) { case (df, (h, c)) =>
      df.withColumnRenamed(h, c) }
    val before = t.liveFiles().map(_._1).toSet
    t.merge(renamed, "tag_no")
    assert(t.read().count() == 3)
    assert(t.read().filter(col("tag_no") === 100L)
      .select("item_description").head.getString(0) == "new desc")
    assert(t.read().filter(col("tag_no") === 200L)
      .select("item_description").head.getString(0) == "keep")
    // and the physical files still store the ORIGINAL name: old files
    // were readable without rewrite, so at least the merge's rewrite
    // is the only file change
    assert(t.liveFiles().map(_._1).toSet != before)
    ()
  }

  test("column mapping works on a hive-partitioned table: readers translate, DML rewrites, partition column protected") {
    val root = fresh("pcm")
    val t = GraftTable.forPath(spark, root)
    t.appendPartitioned(seed()
      .withColumn("bucket", pmod(col("o_orderkey"), lit(4L))), "bucket")
    val want2 = multiset(seed()
      .filter(pmod(col("o_orderkey"), lit(4L)) === 2)
      .withColumn("bucket", pmod(col("o_orderkey"), lit(4L))))
    // rename a payload column: metadata-only, partition-subset
    // readers serve the LOGICAL name with values intact
    val filesBefore = t.liveFiles().map(_._1).toSet
    t.renameColumn("o_totalprice", "price_usd")
    assert(t.liveFiles().map(_._1).toSet == filesBefore,
      "rename on a partitioned table touched files")
    val pruned = t.readPartitionedColumn("bucket", Seq(2L)).get
    assert(pruned.schema.fieldNames.toSeq ==
      Seq("o_orderkey", "o_orderstatus", "price_usd", "bucket"))
    assert(multiset(pruned.withColumnRenamed("price_usd", "o_totalprice"))
      == want2, "pruned read after rename lost rows or values")
    // appends under the NEW logical name land partitioned (staged
    // under the constant physical name)
    import spark.implicits._
    val extraKey = Tables.orders(spark, sf)
      .agg(max("o_orderkey")).head.getLong(0) + 1
    t.appendPartitioned(Seq((extraKey, "Z", 9.99, extraKey % 4))
      .toDF("o_orderkey", "o_orderstatus", "price_usd", "bucket"), "bucket")
    assert(t.readPartitions("bucket", Seq(extraKey % 4)).get
      .filter(col("price_usd") === 9.99).count() == 1)
    // copy-on-write DML through the renamed column stays
    // partition-preserving
    t.deleteWhere(col("o_orderkey") === extraKey)
    assert(t.read().filter(col("price_usd") === 9.99).count() == 0)
    assert(t.readPartitionedColumn("bucket", Seq(2L)).isDefined)
    // drop translates too: the column vanishes from subset reads,
    // files untouched
    t.dropColumn("o_orderstatus")
    assert(t.readPartitions("bucket", Seq(2L)).get
      .schema.fieldNames.toSeq == Seq("o_orderkey", "price_usd"))
    // the partition column's NAME is protected: a payload column may
    // not take it (path-restored values would mask real data)
    intercept[IllegalArgumentException] {
      t.renameColumn("price_usd", "bucket")
    }
    intercept[IllegalArgumentException] { t.addColumn("bucket",
      org.apache.spark.sql.types.LongType) }
    ()
  }
}
