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
  }
}
