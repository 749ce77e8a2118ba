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
  * success commits a NEW VERSIONED manifest `_processed_manifest-N.tsv`
  * (write-temp + rename-to-fresh-name; newest N wins on read). Versioned
  * commits close the delete-then-rename crash window a single fixed-name
  * manifest has: at every instant some complete manifest exists, so a
  * crash mid-commit replays AT MOST the last batch — never the whole
  * backlog. Older versions are pruned after the rename; a crash before
  * pruning leaves harmless stale versions that the next commit removes.
  * A file is identified by (path, length): immutable files never change
  * length, and a same-path re-upload with new content/length is
  * correctly treated as new.
  */
object IncrementalFiles {

  private val ManifestPrefix = "_processed_manifest-"
  private val ManifestSuffix = ".tsv"

  /** Versioned manifests present, as (sequence, path), newest last. */
  private def manifestVersions(f: org.apache.hadoop.fs.FileSystem,
                               manifestDir: String)
      : Seq[(Long, org.apache.hadoop.fs.Path)] = {
    val dir = new org.apache.hadoop.fs.Path(manifestDir)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.map(_.getPath).flatMap { p =>
      val n = p.getName
      if (n.startsWith(ManifestPrefix) && n.endsWith(ManifestSuffix))
        scala.util.Try(n.substring(ManifestPrefix.length,
          n.length - ManifestSuffix.length).toLong).toOption.map(_ -> p)
      else None
    }.sortBy(_._1)
  }

  private def fs(s: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)

  /** The (path, length) set already processed — read from the
    * NEWEST versioned manifest — empty on first run.
    */
  def processed(s: SparkSession, manifestDir: String): Set[(String, Long)] = {
    val f = fs(s, manifestDir)
    manifestVersions(f, manifestDir).lastOption match {
      case None => Set.empty
      case Some((_, p)) =>
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
      val versions = manifestVersions(mf, manifestDir)
      val next = versions.lastOption.map(_._1 + 1).getOrElse(0L)
      val fin = new org.apache.hadoop.fs.Path(manifestDir,
        f"$ManifestPrefix$next%012d$ManifestSuffix")
      val tmp = new org.apache.hadoop.fs.Path(manifestDir,
        s".${fin.getName}.tmp")
      val out = mf.create(tmp, true)
      (done ++ fresh).toSeq.sorted.foreach { case (p, len) =>
        out.write(s"$p\t$len\n".getBytes(UTF_8))
      }
      out.close()
      // rename to a name that does not yet exist — atomic on HDFS and
      // local fs; the previous version stays readable until this
      // succeeds, so there is NO instant with zero complete manifests
      require(mf.rename(tmp, fin), s"manifest rename failed: $tmp -> $fin")
      versions.foreach { case (_, old) => mf.delete(old, false) }
    }
    (df, fresh.map(_._1), commit)
  }
}
