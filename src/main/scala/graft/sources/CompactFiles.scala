package graft.sources

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction — the lakehouse OPTIMIZE step every
  * streaming-ingest table eventually needs: micro-batch sinks (s7,
  * s10, IncrementalFiles' per-drop lands) accrete part files far
  * below the HDFS-block / row-group sweet spot, and at 100 TB the
  * scan cost of a fragmented table is dominated by file-open overhead
  * and footer reads, not bytes.
  *
  * The contract mirrors Delta/Iceberg OPTIMIZE semantics without the
  * table format:
  *   - file SIZES come from filesystem METADATA only (no data read to
  *     decide — the e9 footer-count discipline applied to layout);
  *   - files already >= half the target are COMPLIANT and are moved
  *     byte-identically (a rename-or-copy FS metadata op, never
  *     decoded — rewriting them would churn 100 TB to fix KBs);
  *   - undersized files are read once and rewritten as
  *     ceil(small_bytes / target) files via ONE round-robin exchange
  *     of just the undersized subset;
  *   - output lands in a NEW directory (the caller swaps pointers —
  *     same versioned-manifest discipline as s7/IncrementalFiles;
  *     in-place rewrites can't be atomic on a plain filesystem);
  *   - a `_compaction` parquet manifest self-describes the run
  *     (files in/out, bytes, target — IndexExport's rule).
  *
  * Content is preserved exactly: the rewritten subset is a
  * row-identical reshuffle and the compliant subset is the same
  * bytes. CompactionSpec proves both plus the file-count bound.
  */
object CompactFiles {

  /** Compact `dir`'s part files into `outDir`. Returns the manifest. */
  def compact(s: SparkSession, dir: String, outDir: String,
              targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val conf = s.sparkContext.hadoopConfiguration
    val src = new Path(dir)
    val fs = src.getFileSystem(conf)
    val parts = fs.listStatus(src)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val (compliant, undersized) = parts.partition(_.getLen >= targetBytes / 2)
    val out = new Path(outDir)
    fs.mkdirs(out)
    // compliant files: moved byte-identically, never decoded
    compliant.foreach { f =>
      FileUtil.copy(fs, f.getPath, fs, new Path(out, f.getPath.getName),
        false, conf)
    }
    val smallBytes = undersized.map(_.getLen).sum
    val nOut =
      if (undersized.isEmpty) 0
      else math.max(1L, (smallBytes + targetBytes - 1) / targetBytes).toInt
    if (nOut > 0) {
      // one round-robin exchange of ONLY the undersized subset
      val stage = new Path(out, ".compact_stage")
      s.read.parquet(undersized.map(_.getPath.toString).toIndexedSeq: _*)
        .repartition(nOut)
        .write.mode("overwrite").parquet(stage.toString)
      // Rewritten names carry a per-run id so a re-compaction can never
      // collide with (and silently overwrite) a prior run's
      // compacted-NNNNN output carried over as a compliant file.
      val runId = java.util.UUID.randomUUID.toString.take(8)
      fs.listStatus(stage)
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        .zipWithIndex.foreach { case (f, i) =>
          val dst = new Path(out, f"compacted-$runId-$i%05d.parquet")
          require(!fs.exists(dst), s"compaction output collision: $dst")
          require(fs.rename(f.getPath, dst), s"rename failed: ${f.getPath} -> $dst")
        }
      fs.delete(stage, true)
    }
    import s.implicits._
    val manifest = Seq((parts.length.toLong, compliant.length.toLong,
      undersized.length.toLong, nOut.toLong, smallBytes, targetBytes))
      .toDF("files_in", "files_kept", "files_rewritten_in",
        "files_rewritten_out", "bytes_rewritten", "target_bytes")
    manifest.coalesce(1).write.mode("overwrite")
      .parquet(new Path(out, "_compaction").toString)
    manifest
  }

  def readManifest(s: SparkSession, outDir: String): DataFrame =
    s.read.parquet(new Path(new Path(outDir), "_compaction").toString)
}
