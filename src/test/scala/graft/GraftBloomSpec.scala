package graft

import org.apache.spark.sql.functions._
import graft.sources.GraftTable
import java.nio.file.Files

/** The BLOOM FILTER INDEX (Delta's bloom index as a log-recorded
  * table property): point-predicate file skipping where min/max
  * cannot prune — a high-cardinality column uncorrelated with the
  * file layout. Each write stages a parquet-NATIVE bloom in the data
  * file (scan-time row-group skipping) plus a capped per-file bloom
  * in the add-action stats token (driver-side log-level skipping).
  */
class GraftBloomSpec extends SparkSpec {

  private def multiset(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap

  private def freshRoot() =
    Files.createTempDirectory("graft_bloom").toString + "/t"

  /** orders range-staged on o_custkey, so o_orderkey is SCATTERED:
    * every file's [min,max] orderkey range spans ~the whole key space
    * and stats skipping alone cannot prune a point lookup.
    */
  /** Keys ≡ 0 (mod 97) are withheld, so in-range ABSENT keys exist
    * even against the dense synthetic keyspace.
    */
  private def slices(n: Int) = {
    val df = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .filter(pmod(col("o_orderkey"), lit(97)) =!= 0)
      .repartitionByRange(n, col("o_custkey"))
    (0 until n).map(i => df.filter(spark_partition_id() === i).coalesce(1))
  }

  /** 1 unindexed create + (n-1) bloom-indexed appends. */
  private def bloomTable(n: Int = 8): GraftTable = {
    val ss = slices(n)
    val t = GraftTable.create(spark, freshRoot(), ss.head)
    t.setBloomIndex(Seq("o_orderkey", "o_orderstatus"))
    ss.tail.foreach(s => t.append(s))
    t
  }

  test("bloom index prunes point lookups min/max cannot; absent and present keys stay sound") {
    val t = bloomTable()
    val total = t.liveFiles().size
    val unindexed = t.readCommit(1).adds.size // the pre-index create
    assert(total >= 8, s"expected >=8 files, got $total")
    // a PRESENT key lives in one file; min/max can't tell (every
    // file's range covers it) but the blooms of the other files can
    val keys = Tables.orders(spark, sf).select("o_orderkey")
      .filter(pmod(col("o_orderkey"), lit(97)) =!= 0)
      .collect().map(_.getLong(0)).sorted
    val present = keys(keys.length / 2)
    val pruned = t.prunedFiles(col("o_orderkey") === present)
    assert(pruned.size < total,
      s"bloom pruned nothing: $total files planned for one key")
    assert(multiset(t.readWhere(col("o_orderkey") === present)) ==
      multiset(t.read().filter(col("o_orderkey") === present)),
      "bloom-pruned read diverged")
    // an ABSENT key INSIDE every file's [min,max] (a withheld
    // multiple of 97): only the unindexed create files may survive
    val absent = ((keys(keys.length / 2) / 97) + 1) * 97
    assert(absent < keys.last && !keys.contains(absent))
    val prunedAbsent = t.prunedFiles(col("o_orderkey") === absent)
    assert(prunedAbsent.size <= unindexed,
      s"absent in-range key planned ${prunedAbsent.size} files")
    assert(t.readWhere(col("o_orderkey") === absent).count() == 0)
    // string column: 'G' sits inside the F..P stats range but no row
    // carries it — blooms exclude it, the unindexed files survive
    val prunedG = t.prunedFiles(col("o_orderstatus") === "G")
    assert(prunedG.size <= unindexed,
      s"absent in-range string planned ${prunedG.size} files")
    // IN-lists prune per element
    val prunedIn = t.prunedFiles(col("o_orderkey").isin(present, absent))
    assert(prunedIn.size <= pruned.size + 1)
    // SOUNDNESS SWEEP: a sample of present keys — the bloom may only
    // over-approximate, never drop the containing file
    keys.indices.by(math.max(1, keys.length / 25)).map(keys).foreach { k =>
      assert(t.readWhere(col("o_orderkey") === k).count() ==
        keys.count(_ == k), s"bloom skipping dropped rows for key $k")
    }
    ()
  }

  test("staged data files carry parquet-native blooms; DML rewrites keep the index") {
    val t = bloomTable(4)
    // native bloom present in the footer of an indexed append's file
    val rel = t.readCommit(t.latestVersion).adds.maxBy(_.bytes).path
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(s"${t.root}/$rel"),
      spark.sparkContext.hadoopConfiguration)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val block = r.getFooter.getBlocks.get(0)
      import scala.jdk.CollectionConverters._
      val cm = block.getColumns.asScala
        .find(_.getPath.toDotString == "o_orderkey").get
      assert(r.getBloomFilterDataReader(block).readBloomFilter(cm) != null,
        "no parquet-native bloom filter on the indexed column")
    } finally r.close()
    // a CoW delete's rewritten files re-stage with blooms in their
    // stats tokens (the index follows every rewrite)
    val keys = Tables.orders(spark, sf).select("o_orderkey")
      .collect().map(_.getLong(0)).sorted
    val vDel = t.deleteWhere(col("o_orderkey") === keys(keys.length / 3))
    val adds = t.readCommit(vDel).adds
    assert(adds.nonEmpty && adds.forall(_.stats.exists(_.contains("\"bf\""))),
      "DML rewrite lost the inline blooms")
    ()
  }

  test("the index is a durable table property: survives checkpoints, drops cleanly") {
    val t = bloomTable(4)
    assert(t.bloomIndex().keySet == Set("o_orderkey", "o_orderstatus"))
    // cross a checkpoint (every 8 commits) and re-resolve from it
    (1 to 8).foreach(_ => t.append(slices(4).head.limit(5)))
    assert(t.latestVersion >= 8)
    assert(t.bloomIndex().keySet == Set("o_orderkey", "o_orderstatus"),
      "bloom index lost across the checkpoint")
    // unknown column / unindexable type refuse
    intercept[IllegalArgumentException] { t.setBloomIndex(Seq("nope")) }
    intercept[IllegalArgumentException] { t.setBloomIndex(Seq("o_totalprice")) }
    // drop: later writes stage without blooms
    t.dropBloomIndex()
    assert(t.bloomIndex().isEmpty)
    val v = t.append(slices(4).head.limit(7))
    assert(t.readCommit(v).adds.forall(_.stats.forall(!_.contains("\"bf\""))),
      "writes after dropBloomIndex still stage blooms")
    ()
  }
}
