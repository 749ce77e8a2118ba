package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps
import graft.sources.IndexExport

class IndexExportSpec extends SparkSpec {

  test("inverted index round-trips, self-describes, and double-prunes lookups") {
    val dir = java.nio.file.Files.createTempDirectory("graft_index").toString
    val postings = TextOps.shinglePostings(spark, sf).cache()
    IndexExport.writeIndex(postings, dir, nBuckets = 8)

    // every posting exported exactly once; df table matches a recount
    assert(IndexExport.readPostings(spark, dir).count() == postings.count())
    val df = IndexExport.readTerms(spark, dir)
      .select(col("g"), col("df")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = postings.groupBy("g").agg(count(lit(1)).as("df")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(df == want, "df table diverged from a postings recount")

    // meta carries the build parameters (self-describing index)
    val meta = IndexExport.readMeta(spark, dir).head
    assert(meta.getAs[Long]("n_buckets") == 8L)
    assert(meta.getAs[Long]("n_postings") == postings.count())

    // lookup: exact postings back, via directory pruning
    val probe = postings.limit(3).collect().map(_.getLong(1))
    val got = IndexExport.lookup(spark, dir, probe.toSeq)
      .select("g", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = postings.filter(col("g").isin(probe.toSeq: _*))
      .select("g", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute, s"lookup diverged: ${got.size} vs ${brute.size}")
    val plan = IndexExport.lookup(spark, dir, probe.toSeq)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("term_bucket"),
      s"no partition pruning in lookup:\n$plan")
    postings.unpersist()
  }
}
