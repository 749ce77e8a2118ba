package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** IVF-PQ index export sink — the stored form of e8's offline build
  * (the `(cell, codes, norm)` table its Scaladoc promises): the one
  * corpus-keyed join of PQ codes with coarse-cell routing, laid out
  * so a query's nProbe cells prune to nProbe directories and only
  * 9-byte code rows are decoded there. The trained models ship WITH
  * the index (the coarse centroids and PQ codebooks the probe path
  * needs), so the artifact is self-contained: any session — or any
  * engine that reads parquet — can serve queries from it without
  * retraining, and the meta table carries the build parameters
  * instead of trusting the caller to repeat them (IndexExport's
  * self-description rule).
  *
  *   out/index/cell=…/     (vec_id, codes, nrm) — sorted by vec_id
  *   out/cell_centroids/   (cid, cvec, cn)
  *   out/pq_centroids/     (sub, cid, cvec, h2)
  *   out/meta/             (m, sub_dim, n_vecs)
  *
  * At 100 TB this is the amortization point of the whole ANN family:
  * training and encoding run once per corpus version; every query
  * after that reads nProbe directories of codes — never vectors,
  * never untouched cells.
  */
object AnnIndexExport {

  def writeIndex(index: DataFrame, cellCents: DataFrame,
                 pqCents: DataFrame, outDir: String,
                 m: Int, subDim: Int): Unit = {
    index.select(col("vec_id"), col("codes"), col("nrm"), col("cell"))
      .repartition(col("cell"))
      .sortWithinPartitions("vec_id")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cell").parquet(s"$outDir/index")
    cellCents.write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/cell_centroids")
    pqCents.write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/pq_centroids")
    val s = index.sparkSession
    import s.implicits._
    val nVecs = index.count()
    Seq((m, subDim, nVecs)).toDF("m", "sub_dim", "n_vecs")
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/meta")
  }

  /** The stored codes table; the partition column comes back as the
    * long it was written as (directory names are type-inferred).
    */
  def readIndex(s: SparkSession, outDir: String): DataFrame =
    s.read.parquet(s"$outDir/index")
      .withColumn("cell", col("cell").cast("long"))

  def readCellCentroids(s: SparkSession, outDir: String): DataFrame =
    s.read.parquet(s"$outDir/cell_centroids")

  def readPqCentroids(s: SparkSession, outDir: String): DataFrame =
    s.read.parquet(s"$outDir/pq_centroids")

  def readMeta(s: SparkSession, outDir: String): DataFrame =
    s.read.parquet(s"$outDir/meta")
}
