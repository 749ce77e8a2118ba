package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** IVF-PQ index export sink — the stored form of e8's offline build
  * (the `(cell, codes, norm)` table its Scaladoc promises): the one
  * corpus-keyed join of PQ codes with coarse-cell routing, laid out
  * so a query's nProbe cells prune to nProbe cells' files and only
  * 9-byte code rows are decoded there. The trained models ship WITH
  * the index (the coarse centroids and PQ codebooks the probe path
  * needs), so the artifact is self-contained: any session — or any
  * engine that reads parquet — can serve queries from it without
  * retraining, and the meta table carries the build parameters
  * instead of trusting the caller to repeat them (IndexExport's
  * self-description rule).
  *
  * The CODES TABLE is a [[GraftTable]] since round 9 — the one
  * mutable artifact that still appended bare parquet behind a meta
  * row (the round-8 advice): build is one partitioned commit,
  * incremental append (e12 / FAISS add()) is one ATOMIC, optionally
  * tag-idempotent commit — a failed or replayed append can no longer
  * leave duplicate vec_id rows or a half-landed batch visible — and
  * probes prune cells at the COMMIT LOG (readPartitionedColumn), not
  * by directory listing. The trained models and meta stay plain
  * overwrite-once parquet (single-writer, written before/after the
  * codes commit).
  *
  *   out/index/               GraftTable of (vec_id, codes, nrm) by cell
  *   out/cell_centroids/      (cid, cvec, cn)
  *   out/pq_centroids/        (sub, cid, cvec, h2)
  *   out/meta/                (m, sub_dim, n_vecs)
  *
  * At 100 TB this is the amortization point of the whole ANN family:
  * training and encoding run once per corpus version; every query
  * after that reads nProbe cells of codes — never vectors, never
  * untouched cells — and daily adds are O(batch) commits.
  */
object AnnIndexExport {

  private def codes(s: SparkSession, outDir: String): GraftTable =
    GraftTable.forPath(s, s"$outDir/index")

  def writeIndex(index: DataFrame, cellCents: DataFrame,
                 pqCents: DataFrame, outDir: String,
                 m: Int, subDim: Int): Unit = {
    val s = index.sparkSession
    codes(s, outDir).overwritePartitioned(
      index.select(col("vec_id"), col("codes"), col("nrm"), col("cell"))
        .repartition(col("cell"))
        .sortWithinPartitions("vec_id"),
      "cell")
    cellCents.write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/cell_centroids")
    pqCents.write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/pq_centroids")
    import s.implicits._
    val nVecs = index.count()
    Seq((m, subDim, nVecs)).toDF("m", "sub_dim", "n_vecs")
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/meta")
  }

  /** Append encoded rows as ONE atomic commit; with a `tag`, a
    * replayed batch is a no-op (the FAISS add() retry story the bare
    * SaveMode.Append could not give). Returns None on a replay.
    */
  def appendIndexRows(s: SparkSession, rows: DataFrame, outDir: String,
                      tag: String = null): Option[Long] =
    codes(s, outDir).appendPartitioned(
      rows.select(col("vec_id"), col("codes"), col("nrm"), col("cell"))
        .repartition(col("cell"))
        .sortWithinPartitions("vec_id"),
      "cell", tag)

  /** The full stored codes table, cell column restored from the log. */
  def readIndex(s: SparkSession, outDir: String): DataFrame = {
    val t = codes(s, outDir)
    t.readPartitionedColumn("cell", t.partitionValues("cell"))
      .getOrElse(sys.error(s"no index at $outDir"))
  }

  /** ONLY the probed cells' files — pruned at the commit log, never
    * a directory listing; the probe path's scan.
    */
  def readCells(s: SparkSession, outDir: String,
                cells: Seq[Long]): Option[DataFrame] =
    codes(s, outDir).readPartitionedColumn("cell", cells)

  // ---- flat-PQ artifact (e7's stored form) ----------------------------
  //
  //   out/codes/          GraftTable of (vec_id, codes, nrm) — flat
  //   out/pq_centroids/   (sub, cid, cvec, h2)
  //   out/meta/           (m, sub_dim, n_vecs)
  //
  // e7 scans ALL codes per query (no coarse cells), so its stored form
  // is the codebooks + the encoded table with no partition column —
  // what FAISS's IndexPQ persists. Until round 10 e7 was the one
  // approximate method still training its codebook in-session per
  // query; this makes its build/query cost split honest in e13.

  private def flatCodes(s: SparkSession, outDir: String): GraftTable =
    GraftTable.forPath(s, s"$outDir/codes")

  def writePqIndex(codesDf: DataFrame, pqCents: DataFrame, outDir: String,
                   m: Int, subDim: Int): Unit = {
    val s = codesDf.sparkSession
    val t = flatCodes(s, outDir)
    val rows = codesDf.select(col("vec_id"), col("codes"), col("nrm"))
    if (t.latestVersion == 0) t.append(rows) else t.overwrite(rows)
    pqCents.write.mode(SaveMode.Overwrite).parquet(s"$outDir/pq_centroids")
    import s.implicits._
    val nVecs = t.read().count()
    Seq((m, subDim, nVecs)).toDF("m", "sub_dim", "n_vecs")
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/meta")
  }

  /** The stored flat codes table (snapshot-isolated log read). */
  def readPqCodes(s: SparkSession, outDir: String): DataFrame =
    flatCodes(s, outDir).read()

  def readCellCentroids(s: SparkSession, outDir: String): DataFrame =
    s.read.parquet(s"$outDir/cell_centroids")

  def readPqCentroids(s: SparkSession, outDir: String): DataFrame =
    s.read.parquet(s"$outDir/pq_centroids")

  def readMeta(s: SparkSession, outDir: String): DataFrame =
    s.read.parquet(s"$outDir/meta")
}
