package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.charset.StandardCharsets.UTF_8

/** Manifest-based incremental file ingestion — the batch analog of a
  * streaming file source, for the landing-zone pattern the reference
  * runs by hand (re-reading the whole upload folder on every sync,
  * `app.py:6631`): upstream keeps dropping immutable files into a
  * directory; each pipeline run must process every file EXACTLY ONCE,
  * survive crashes, and never re-read the backlog. At 100 TB the
  * backlog is millions of files — re-listing is cheap (one namenode
  * listing), re-READING is the disaster; the manifest makes each run
  * O(new data).
  *
  * Mechanics: a text manifest (one `path\tlength` line per processed
  * file) lives next to nothing else in `manifestDir`. A run lists the
  * input directory, subtracts the manifest, reads ONLY the new files
  * (passed as explicit paths — no glob re-expansion race: files
  * landing mid-run are simply next run's batch), and on caller-side
  * success commits an updated manifest via write-temp + atomic rename
  * — the same single-writer commit discipline as ShardExport's
  * per-batch markers. A file is identified by (path, length):
  * immutable files never change length, and a same-path re-upload
  * with new content/length is correctly treated as new.
  */
object IncrementalFiles {

  private val ManifestName = "_processed_manifest.tsv"

  private def fs(s: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)

  /** The (path, length) set already processed, empty on first run. */
  def processed(s: SparkSession, manifestDir: String): Set[(String, Long)] = {
    val f = fs(s, manifestDir)
    val p = new org.apache.hadoop.fs.Path(manifestDir, ManifestName)
    if (!f.exists(p)) Set.empty
    else {
      val in = f.open(p)
      val bytes = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bytes, 65536, true)
      new String(bytes.toByteArray, UTF_8).linesIterator
        .filter(_.nonEmpty)
        .map { l =>
          val i = l.lastIndexOf('\t')
          (l.substring(0, i), l.substring(i + 1).toLong)
        }.toSet
    }
  }

  /** One incremental batch: the not-yet-processed files under
    * `inputDir` (non-recursive, data files only) and a commit
    * callback. Call order is load → process/write downstream →
    * `commit()`; a crash before commit re-presents the same batch
    * next run (at-least-once into an idempotent sink — the same
    * contract Structured Streaming's file source gives its sinks).
    */
  def nextBatch(s: SparkSession, inputDir: String, manifestDir: String,
                format: String = "parquet")
      : (Option[DataFrame], Seq[String], () => Unit) = {
    val f = fs(s, inputDir)
    val done = processed(s, manifestDir)
    val all = f.listStatus(new org.apache.hadoop.fs.Path(inputDir)).toSeq
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
      .map(st => (st.getPath.toString, st.getLen))
    val fresh = all.filterNot(done).sortBy(_._1)
    val df =
      if (fresh.isEmpty) None
      else Some(s.read.format(format).load(fresh.map(_._1): _*))
    val commit = () => {
      val mf = fs(s, manifestDir)
      val dir = new org.apache.hadoop.fs.Path(manifestDir)
      if (!mf.exists(dir)) mf.mkdirs(dir)
      val tmp = new org.apache.hadoop.fs.Path(manifestDir,
        s"$ManifestName.tmp")
      val out = mf.create(tmp, true)
      (done ++ fresh).toSeq.sorted.foreach { case (p, len) =>
        out.write(s"$p\t$len\n".getBytes(UTF_8))
      }
      out.close()
      val fin = new org.apache.hadoop.fs.Path(manifestDir, ManifestName)
      if (mf.exists(fin)) mf.delete(fin, false)
      require(mf.rename(tmp, fin), s"manifest rename failed: $tmp -> $fin")
    }
    (df, fresh.map(_._1), commit)
  }
}
