package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  * The processed-file ledger is a [[GraftTable]] of (path, length)
  * rows since round 9 — the hand-rolled `_processed_manifest-N.tsv`
  * this source carried was the versioned-commit protocol in
  * miniature, and the unified commit log supplies its every property
  * (at every instant some complete committed state exists; a crash
  * mid-commit replays AT MOST the last batch) while IMPROVING the
  * write path: a commit appends O(batch) ledger rows instead of
  * rewriting the full processed set, with the log's periodic
  * checkpoints bounding resolution — at millions of files that's the
  * difference between an O(backlog) and an O(batch) commit. A file is
  * identified by (path, length): immutable files never change length,
  * and a same-path re-upload with new content/length is correctly
  * treated as new. Duplicate ledger rows from a crash-replayed commit
  * are harmless — the processed SET collapses them.
  */
object IncrementalFiles {

  /** The (path, length) set already processed — empty on first run. */
  def processed(s: SparkSession, manifestDir: String): Set[(String, Long)] = {
    val t = GraftTable.forPath(s, manifestDir)
    if (t.latestVersion == 0) Set.empty
    else t.read().select("path", "length").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
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
    val f = new org.apache.hadoop.fs.Path(inputDir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
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
      // ONE atomic ledger commit of just this batch's rows; every
      // 16th commit compacts the accreted one-file-per-batch ledger
      // so processed() stays a bounded read instead of O(total
      // batches ever) tiny-file opens
      import s.implicits._
      val t = GraftTable.forPath(s, manifestDir)
      val v = t.append(fresh.toDF("path", "length").coalesce(1))
      if (v % 16 == 0) t.compact(4L * 1024 * 1024)
      ()
    }
    (df, fresh.map(_._1), commit)
  }
}
