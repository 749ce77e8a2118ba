package graft

import org.apache.spark.sql.functions._
import graft.operators.{Similarity, TextOps}
import graft.sources.{AnnIndexExport, IndexExport}

class IndexExportSpec extends SparkSpec {

  test("e8 stored index round-trips bit-equal; probe reads only probed cells") {
    val dir = java.nio.file.Files.createTempDirectory("graft_e8idx").toString
    Similarity.e8WriteIndex(spark, sf, dir)
    // self-describing artifact: meta carries the build parameters and
    // the exported code rows cover every vector exactly once
    val meta = AnnIndexExport.readMeta(spark, dir).head
    assert(meta.getAs[Int]("m") == 8)
    val nVecs = Tables.embeddings(spark, sf).count()
    assert(meta.getAs[Long]("n_vecs") == nVecs)
    val idx = AnnIndexExport.readIndex(spark, dir)
    assert(idx.count() == nVecs && idx.select("vec_id").distinct().count() == nVecs)
    // round-trip equality: training is deterministic, so serving from
    // the stored models + codes is BIT-EQUAL to the inline e8 (ranks,
    // ids, and re-ranked cosines)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getAs[Long]("qid"), r.getAs[Long]("rnk"), r.getAs[Long]("nid"),
        r.getAs[Double]("cosine"))).toSeq
    val stored = key(Similarity.e8KnnIvfPqFromIndex(spark, sf, dir))
    val inline = key(Similarity.queries("e8_knn_ivfpq")(spark, sf))
    assert(stored == inline, s"stored-index serving diverged from inline e8")
    // the probe read is pruned at the index's COMMIT LOG: only the
    // probed cells' files are planned or opened — the untouched
    // cells' files never enter the scan at all
    val est = AnnIndexExport.readCells(spark, dir, Seq(0L, 1L)).get
    val filesRead = est.select(input_file_name()).distinct()
      .collect().map(_.getString(0)).toSet
    assert(filesRead.nonEmpty &&
      filesRead.forall(f => f.contains("/cell=0/") || f.contains("/cell=1/")),
      s"probe opened files outside the probed cells: $filesRead")
    val allCells = graft.sources.GraftTable
      .forPath(spark, s"$dir/index").partitionValues("cell")
    assert(allCells.size > 2,
      s"fixture too small to prove pruning: cells $allCells")
    // and the pruned read is exactly the filtered full read
    val full = AnnIndexExport.readIndex(spark, dir)
      .filter(col("cell").isin(0L, 1L))
    assert(est.count() == full.count() && est.count() > 0)
  }

  test("e7 stored flat-PQ index serves bit-equal to inline (zero query-path training)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_e7idx").toString
    Similarity.e7WriteIndex(spark, sf, dir)
    // self-describing artifact: meta + codebooks + one code row per
    // vector, the codes table behind the commit log
    val meta = AnnIndexExport.readMeta(spark, dir).head
    assert(meta.getAs[Int]("m") == 8)
    val nVecs = Tables.embeddings(spark, sf).count()
    assert(meta.getAs[Long]("n_vecs") == nVecs)
    val codes = AnnIndexExport.readPqCodes(spark, dir)
    assert(codes.count() == nVecs &&
      codes.select("vec_id").distinct().count() == nVecs)
    assert(AnnIndexExport.readPqCentroids(spark, dir).count() == 8L * 16L)
    // deterministic trainer + shared scoring path: stored serving is
    // BIT-EQUAL to the in-session e7 (ranks, ids, exact cosines)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getAs[Long]("qid"), r.getAs[Long]("rnk"), r.getAs[Long]("nid"),
        r.getAs[Double]("cosine"))).toSeq
    val stored = key(Similarity.e7PqAnnFromIndex(spark, sf, dir))
    val inline = key(Similarity.queries("e7_pq_ann")(spark, sf))
    assert(stored == inline, "stored flat-PQ serving diverged from inline e7")
  }

  test("e11 stored graph serves bit-equal to inline; each round prunes src buckets") {
    val dir = java.nio.file.Files.createTempDirectory("graft_e11idx").toString
    Similarity.e11WriteGraph(spark, sf, dir)
    // self-describing artifact
    val meta = spark.read.parquet(s"$dir/meta").head
    assert(meta.getAs[Int]("deg") == 8 && meta.getAs[Int]("n_buckets") == 16)
    assert(spark.read.parquet(s"$dir/entries").count() == 16L)
    // construction is deterministic, so beam search over the stored
    // adjacency is BIT-EQUAL to the inline build (ranks, ids, cosines)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getAs[Long]("qid"), r.getAs[Long]("rnk"), r.getAs[Long]("nid"),
        r.getAs[Double]("cosine"))).toSeq
    val probed = scala.collection.mutable.Buffer.empty[Int]
    val stored = key(Similarity.e11GraphAnnFromIndex(spark, sf, dir,
      probedBuckets = probed))
    val inline = key(Similarity.queries("e11_graph_ann")(spark, sf))
    assert(stored == inline, "stored-graph serving diverged from inline e11")
    // every beam round collected an answer-sized bucket set and the
    // scan never had to touch all partitions
    val total = new java.io.File(s"$dir/adj").listFiles()
      .count(_.getName.startsWith("sbucket="))
    assert(probed.size == 3, s"expected 3 rounds, saw ${probed.size}")
    assert(probed.forall(n => n >= 1 && n <= total),
      s"bucket counts out of range: $probed (total $total)")
    // the expansion plan is partition-pruned on sbucket
    val pruneProbe = spark.read.parquet(s"$dir/adj")
      .withColumn("sbucket", col("sbucket").cast("long"))
      .filter(col("sbucket").isin(0L, 1L))
    val plan = pruneProbe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("sbucket"),
      s"no partition pruning on sbucket:\n$plan")
    val scanned = pruneProbe.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
    }.sum
    assert(scanned <= 2 && scanned < total,
      s"sbucket filter read $scanned of $total partitions — not pruned")
  }

  test("e12 append equals a one-shot frozen-model rebuild (incremental ANN)") {
    // build the artifact the e12 entry serves from: base index (80%,
    // models trained there) + one appended batch (20%, frozen models)
    val dir = Similarity.e12Build(spark, sf)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getAs[Long]("vec_id"), r.getSeq[Long](r.fieldIndex("codes")).toList,
        r.getAs[Long]("nrm"), r.getAs[Long]("cell"))).toSet
    // the INCREMENTAL ≡ FULL contract: the appended index is
    // bit-equal to encoding base ∪ batch in one shot through the SAME
    // stored quantizers — so every query over the appended artifact
    // equals the rebuild's answer by construction
    val stored = rows(AnnIndexExport.readIndex(spark, dir)
      .select("vec_id", "codes", "nrm", "cell"))
    val rebuilt = rows(Similarity.e8EncodeWith(
      spark, Similarity.quantized(spark, sf), dir))
    assert(stored == rebuilt,
      "appended index diverges from the frozen-model one-shot encode")
    // meta advanced to the full count; every vector present once
    val nVecs = Tables.embeddings(spark, sf).count()
    assert(AnnIndexExport.readMeta(spark, dir).head
      .getAs[Long]("n_vecs") == nVecs)
    val idx = AnnIndexExport.readIndex(spark, dir)
    assert(idx.count() == nVecs &&
      idx.select("vec_id").distinct().count() == nVecs)
    // and the served entry answers with the e1 result shape
    val got = Similarity.queries("e12_incremental_ann")(spark, sf)
    assert(got.columns.toSeq == Seq("qid", "nid", "cosine", "rnk"))
    assert(got.count() > 0)
  }

  test("a replayed tagged index append is a no-op (atomic FAISS add)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_e8add").toString
    val emb = Similarity.quantized(spark, sf)
    Similarity.e8WriteIndexFrom(spark, emb.filter(col("vec_id") % 4 =!= 0), dir)
    val base = AnnIndexExport.readIndex(spark, dir).count()
    val batch = emb.filter(col("vec_id") % 4 === 0)
    Similarity.e8AppendToIndex(spark, batch, dir, tag = "add-1")
    val after = AnnIndexExport.readIndex(spark, dir).count()
    assert(after == base + batch.count())
    // the retry a crashed driver would issue: same tag, ZERO effect —
    // no duplicate vec_ids, meta still consistent
    Similarity.e8AppendToIndex(spark, batch, dir, tag = "add-1")
    val idx = AnnIndexExport.readIndex(spark, dir)
    assert(idx.count() == after, "replayed append duplicated rows")
    assert(idx.select("vec_id").distinct().count() == after,
      "replayed append duplicated vec_ids")
    assert(AnnIndexExport.readMeta(spark, dir).head
      .getAs[Long]("n_vecs") == after)
  }

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
