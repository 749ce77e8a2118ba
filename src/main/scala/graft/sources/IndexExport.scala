package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Inverted-index export sink — the offline artifact behind sparse
  * retrieval (e5): term-hash → document postings laid out so a
  * serving-time term lookup reads one directory instead of the
  * corpus. The reference serves its search (`TAG_NO ILIKE`,
  * `app.py:5194`) straight from a warehouse; the 100 TB equivalent
  * precomputes the postings and ships them as a prunable layout any
  * engine (or this library's `lookup`) can probe.
  *
  *   out/postings/term_bucket=…/  (g, doc_id)
  *   out/terms/term_bucket=…/     (g, df)
  *   out/meta/                    (n_buckets, n_docs, n_terms, n_postings)
  *
  * term_bucket = pmod(g, nBuckets): term hashes are high-cardinality,
  * so raw-hash partitioning would create one directory per term; the
  * bounded bucket keeps the layout sane while a single-term read
  * still prunes to one directory. Within each bucket the rows are
  * sorted by (g, doc_id), so parquet row-group min/max statistics
  * skip non-matching groups INSIDE the pruned directory — two levels
  * of pruning before any row is decoded. The index is
  * self-describing: `lookup` reads nBuckets from out/meta rather
  * than trusting the caller to repeat the build parameter (the same
  * coupling-bug class the Bloom header word closed).
  */
object IndexExport {

  /** @param postings (doc_id, g) term-hash postings, e.g.
    *   TextOps.shinglePostings — one row per (document, distinct term)
    */
  def writeIndex(postings: DataFrame, outDir: String, nBuckets: Int = 64): Unit = {
    val p = postings.select(col("g"), col("doc_id"))
      .withColumn("term_bucket", pmod(col("g"), lit(nBuckets.toLong)))
    p.repartition(col("term_bucket"))
      .sortWithinPartitions("g", "doc_id")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("term_bucket").parquet(s"$outDir/postings")
    postings.groupBy("g").agg(count(lit(1)).as("df"))
      .withColumn("term_bucket", pmod(col("g"), lit(nBuckets.toLong)))
      .repartition(col("term_bucket"))
      .sortWithinPartitions("g")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("term_bucket").parquet(s"$outDir/terms")
    val s = postings.sparkSession
    import s.implicits._
    val (nPost, nDocs) = (postings.count(),
      postings.select(countDistinct(col("doc_id"))).head.getLong(0))
    val nTerms = postings.select(countDistinct(col("g"))).head.getLong(0)
    Seq((nBuckets.toLong, nDocs, nTerms, nPost))
      .toDF("n_buckets", "n_docs", "n_terms", "n_postings")
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/meta")
  }

  def readPostings(s: SparkSession, outDir: String): DataFrame =
    s.read.parquet(s"$outDir/postings")

  def readTerms(s: SparkSession, outDir: String): DataFrame =
    s.read.parquet(s"$outDir/terms")

  def readMeta(s: SparkSession, outDir: String): DataFrame =
    s.read.parquet(s"$outDir/meta")

  /** Postings for the given term hashes — a partition-pruned probe:
    * the bucket predicate prunes directories, the `g` predicate lets
    * row-group stats skip within them.
    */
  def lookup(s: SparkSession, outDir: String, termHashes: Seq[Long]): DataFrame = {
    val nBuckets = readMeta(s, outDir).head.getAs[Long]("n_buckets")
    val buckets = termHashes.map(h => ((h % nBuckets) + nBuckets) % nBuckets).distinct
    readPostings(s, outDir)
      .filter(col("term_bucket").isin(buckets: _*) &&
              col("g").isin(termHashes: _*))
  }
}
