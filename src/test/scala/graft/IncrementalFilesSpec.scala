package graft

import graft.sources.IncrementalFiles

class IncrementalFilesSpec extends SparkSpec {

  test("each file is processed exactly once across runs; crash replays") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("incr_in").toString
    val mf = java.nio.file.Files.createTempDirectory("incr_mf").toString

    // upstream drop 1: two part files
    (0L until 10L).toDF("id").repartition(2)
      .write.mode("append").parquet(in)
    val (df1, files1, commit1) = IncrementalFiles.nextBatch(spark, in, mf)
    assert(files1.length == 2 && df1.get.count() == 10)
    commit1()

    // nothing new → empty batch, no read
    val (df2, files2, _) = IncrementalFiles.nextBatch(spark, in, mf)
    assert(df2.isEmpty && files2.isEmpty)

    // upstream drop 2: one more file
    (10L until 15L).toDF("id").repartition(1)
      .write.mode("append").parquet(in)
    val (df3, files3, commit3) = IncrementalFiles.nextBatch(spark, in, mf)
    assert(files3.length == 1 && df3.get.count() == 5)
    assert(files3.intersect(files1).isEmpty, "old files re-presented")

    // crash before commit: the SAME batch is re-presented next run
    val (df4, files4, _) = IncrementalFiles.nextBatch(spark, in, mf)
    assert(files4 == files3 && df4.get.count() == 5)
    commit3()
    val (df5, _, _) = IncrementalFiles.nextBatch(spark, in, mf)
    assert(df5.isEmpty)

    // the union of committed batches is exactly the corpus
    assert(IncrementalFiles.processed(spark, mf).size == 3)
    assert(spark.read.parquet(in).count() == 15)

    // ledger invariants, now through the GraftTable commit log: one
    // commit per committed batch, each O(batch)-sized; the full
    // processed set never rewrites
    val t = graft.sources.GraftTable.forPath(spark, mf)
    assert(t.versions().size == 2, "one ledger commit per committed batch")
    val perCommit = t.versions().map(v => t.readCommit(v).adds.size)
    assert(perCommit.forall(_ >= 1))
    // time travel: the ledger AS OF commit 1 knows only drop 1's files
    assert(t.readVersion(1).count() == 2)
    // a crash-replayed commit (same batch committed twice) adds
    // duplicate ledger rows but cannot change the processed SET or
    // re-present files
    commit3()
    assert(IncrementalFiles.processed(spark, mf).size == 3,
      "replayed commit must not grow the processed set")
    val (df6, _, _) = IncrementalFiles.nextBatch(spark, in, mf)
    assert(df6.isEmpty, "replayed commit must not re-present files")
  }

  test("schema-evolution read unions additive schemas, nulls old rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evolve").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.mode("append").parquet(dir)
    Seq((3L, "c", 9.5), (4L, "d", 7.0)).toDF("id", "name", "score")
      .write.mode("append").parquet(dir)
    val merged = graft.sources.Readers.parquetEvolved(spark, dir)
    assert(merged.columns.sorted.sameElements(Array("id", "name", "score")))
    val rows = merged.collect()
      .map(r => r.getAs[Long]("id") ->
        (if (r.isNullAt(r.fieldIndex("score"))) None
         else Some(r.getAs[Double]("score")))).toMap
    assert(rows == Map(1L -> None, 2L -> None,
      3L -> Some(9.5), 4L -> Some(7.0)),
      "old rows must read as null for the evolved column")
  }
}
