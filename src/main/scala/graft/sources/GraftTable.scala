package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.charset.StandardCharsets.UTF_8

/** Transactional parquet table — ONE commit-log discipline for every
  * mutable artifact in the engine, replacing the four per-sink
  * manifest mechanisms that each reinvented a slice of it (s7's
  * per-bucket version TSVs, IncrementalFiles' `_processed_manifest-N`,
  * CompactFiles' `_compaction` + fresh-dir swap, ShardExport's
  * `_index`). The reference delegates exactly this consistency to its
  * warehouse (`app.py:4826` audit history, `app.py:6754-6815`
  * scheduled sync); a lakehouse engine has to provide it itself.
  *
  * Layout:
  * {{{
  *   root/_graft_log/v000000000001.txt    commit files (delta actions)
  *   root/_graft_log/ckpt-v000000000008.txt  checkpoint (full live set)
  *   root/data/<uuid>/part-*.parquet      immutable data files
  * }}}
  *
  * Protocol (Delta-Lake-shaped, format-independent):
  *   - data files are IMMUTABLE and uniquely named; a commit is the
  *     ONLY mutation, published as `v<N>` listing `add`/`remove`
  *     actions (relative paths + sizes);
  *   - publish is single-winner atomic: the commit body is staged to
  *     a tmp file, then linked/renamed to the version name — hard
  *     link on a local fs (POSIX link(2) fails if the name exists),
  *     namenode-atomic rename on HDFS. Losers re-resolve and retry
  *     (append) or abort on true conflict (compact/overwrite whose
  *     removed files are no longer live) — optimistic concurrency;
  *   - readers resolve a snapshot from the log ONLY (never by listing
  *     `data/`): newest checkpoint ≤ V, then deltas (ckpt, V]. The
  *     resolved file list is pinned, so a reader holds version V
  *     unperturbed while writers publish V+1… — snapshot isolation;
  *   - every Kth commit writes a checkpoint of the full live set, so
  *     resolution reads O(K) small files regardless of table age —
  *     at 100 TB / millions of commits the log never becomes the scan;
  *   - `remove` is LOGICAL: the file leaves the live set but stays on
  *     disk, which is what makes `readVersion(n)` (time travel) and
  *     long-running snapshot readers safe under concurrent compaction.
  *     `vacuum(retain)` physically deletes files unreferenced by the
  *     retained version horizon — the only deletion in the protocol.
  *
  * Compaction under this discipline beats CompactFiles' fresh-dir
  * swap: compliant files are NOT copied (they are already immutable
  * table files — the commit simply keeps them live), undersized files
  * are read once, rewritten to ~target-sized files, and swapped in a
  * single atomic commit. No reader can observe a half-swapped
  * directory at any instant, which closes the exposure the per-sink
  * mechanisms all had.
  */
class GraftTable private (val s: SparkSession, val root: String) {

  import GraftTable._

  private val conf = s.sparkContext.hadoopConfiguration
  private val rootPath = new Path(root)
  private val fs: FileSystem = rootPath.getFileSystem(conf)
  private def logDir = new Path(rootPath, LogDir)

  // ---- log resolution -------------------------------------------------

  /** Committed versions present in the log, ascending. */
  def versions(): Seq[Long] =
    if (!fs.exists(logDir)) Seq.empty
    else fs.listStatus(logDir).toSeq.map(_.getPath.getName).flatMap { n =>
      if (n.startsWith(VerPrefix) && n.endsWith(Suffix))
        scala.util.Try(n.substring(VerPrefix.length,
          n.length - Suffix.length).toLong).toOption
      else None
    }.sorted

  def latestVersion: Long = versions().lastOption.getOrElse(0L)

  private def checkpointVersions(): Seq[Long] =
    fs.listStatus(logDir).toSeq.map(_.getPath.getName).flatMap { n =>
      if (n.startsWith(CkptPrefix) && n.endsWith(Suffix))
        scala.util.Try(n.substring(CkptPrefix.length,
          n.length - Suffix.length).toLong).toOption
      else None
    }.sorted

  private def readLines(p: Path): Seq[String] = {
    val in = fs.open(p)
    val bytes = new java.io.ByteArrayOutputStream()
    org.apache.hadoop.io.IOUtils.copyBytes(in, bytes, 65536, true)
    new String(bytes.toByteArray, UTF_8).linesIterator.filter(_.nonEmpty).toSeq
  }

  private def commitPath(v: Long) = new Path(logDir, f"$VerPrefix$v%012d$Suffix")
  private def ckptPath(v: Long) = new Path(logDir, f"$CkptPrefix$v%012d$Suffix")

  private[graft] case class Commit(version: Long, action: String,
                                   adds: Seq[(String, Long)],
                                   removes: Seq[String],
                                   tsMillis: Long)

  private[graft] def readCommit(v: Long): Commit = {
    val lines = readLines(commitPath(v))
    // header: graft-commit \t version \t action [\t epoch-millis]
    // (the timestamp field is round-9; older logs read as ts = 0)
    val hdr = lines.head.split("\t", 4)
    val (ver, action) = (hdr(1), hdr(2))
    val ts = if (hdr.length >= 4) hdr(3).toLong else -1L // -1: pre-ts log
    val adds = Seq.newBuilder[(String, Long)]
    val rems = Seq.newBuilder[String]
    lines.tail.foreach { l =>
      val f = l.split("\t", 3)
      f(0) match {
        case "add"    => adds += ((f(1), f(2).toLong))
        case "remove" => rems += f(1)
        case other => sys.error(s"corrupt commit v$v: unknown action $other")
      }
    }
    Commit(ver.toLong, action, adds.result(), rems.result(), ts)
  }

  /** The live (relpath → bytes) set at version `v` — checkpoint ≤ v
    * plus the deltas after it; O(checkpointEvery) log files read, not
    * O(table age).
    */
  private def resolve(v: Long): Map[String, Long] = {
    if (v <= 0) return Map.empty
    val base = checkpointVersions().filter(_ <= v).lastOption
    val start: Map[String, Long] = base match {
      case None => Map.empty
      case Some(cv) => readLines(ckptPath(cv)).map { l =>
        val f = l.split("\t", 3); (f(1), f(2).toLong)
      }.toMap
    }
    val from = base.getOrElse(0L)
    versions().filter(x => x > from && x <= v)
      .foldLeft(start) { (live, cv) =>
        val c = readCommit(cv)
        (live -- c.removes) ++ c.adds
      }
  }

  // ---- reads ----------------------------------------------------------

  /** Latest committed snapshot. The file list is pinned at call time:
    * later commits (appends, compactions) do not perturb this
    * DataFrame — snapshot isolation.
    */
  def read(): DataFrame = readVersion(latestVersion)

  /** The live files of version `v` as absolute paths — the snapshot
    * a reader (readVersion, or the `graft` DataSource) scans.
    */
  def filesAsOf(v: Long): Seq[String] = {
    require(v >= 1 && fs.exists(commitPath(v)),
      s"version $v does not exist (have: ${versions().mkString(",")})")
    val files = resolve(v).keys.toSeq.sorted.map(rel => s"$root/$rel")
    require(files.nonEmpty, s"version $v has an empty live set")
    files
  }

  /** Time travel: the table exactly as committed at version `v`. */
  def readVersion(v: Long): DataFrame =
    s.read.parquet(filesAsOf(v): _*)

  /** The newest version committed at or before `tsMillis` — the
    * TIMESTAMP AS OF resolution (commit wall-clocks are recorded in
    * each log header; pre-round-9 logs read as epoch 0 and resolve
    * to nothing). None if the table didn't exist yet.
    */
  def versionAt(tsMillis: Long): Option[Long] =
    versions().filter { v =>
      val ts = readHeaderTs(v) // header line only — never the body
      ts >= 0 && ts <= tsMillis // pre-ts commits never match (doc'd)
    }.lastOption

  /** A commit's wall-clock from its header line alone — resolution
    * stays O(versions × one line), not O(versions × commit body)
    * (an overwrite/compact commit's body lists every file it swaps).
    */
  private def readHeaderTs(v: Long): Long = {
    val in = fs.open(commitPath(v))
    try {
      val br = new java.io.BufferedReader(
        new java.io.InputStreamReader(in, "UTF-8"))
      val hdr = br.readLine().split("\t", 4)
      if (hdr.length >= 4) hdr(3).toLong else -1L
    } finally in.close()
  }

  /** Time travel by wall-clock: the table as of `tsMillis`. */
  def readTimestampAsOf(tsMillis: Long): DataFrame =
    readVersion(versionAt(tsMillis).getOrElse(sys.error(
      s"no commit at or before $tsMillis in $root")))

  /** Per-version audit trail: (version, action, n_added, n_removed,
    * bytes_added) — the commit log as a queryable DataFrame.
    */
  def history(): DataFrame = {
    import s.implicits._
    versions().map { v =>
      val c = readCommit(v)
      (v, c.action, c.adds.size.toLong, c.removes.size.toLong,
        c.adds.map(_._2).sum, c.tsMillis)
    }.toDF("version", "action", "n_added", "n_removed", "bytes_added",
      "committed_at_ms")
  }

  /** Live parquet files (relative path, bytes) at the latest version. */
  def liveFiles(): Seq[(String, Long)] = resolve(latestVersion).toSeq.sorted

  // ---- writes ---------------------------------------------------------

  /** Stage `df` as immutable uniquely-named data files; returns their
    * (relpath, bytes). Data lands BEFORE any commit references it, so
    * a crash here leaves only unreferenced files (vacuum's job).
    */
  private def freshSub() =
    s"$DataDir/${java.util.UUID.randomUUID.toString.take(12)}"

  private def listStaged(sub: String): Seq[(String, Long)] =
    fs.listStatus(new Path(rootPath, sub)).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(f => (s"$sub/${f.getPath.getName}", f.getLen))

  private def stage(df: DataFrame): Seq[(String, Long)] = {
    val sub = freshSub()
    df.write.parquet(s"$root/$sub")
    listStaged(sub)
  }

  /** Single-winner atomic publish of `bytes` at `dst`: stage to tmp,
    * then hard-link (local fs — POSIX link(2) fails atomically if dst
    * exists) or rename (HDFS — namenode-atomic, false if dst exists).
    * Readers can never observe a partially-written commit file.
    */
  private def publish(dst: Path, bytes: Array[Byte]): Boolean = {
    val tmp = new Path(logDir, s".${dst.getName}.${java.util.UUID.randomUUID.toString.take(8)}.tmp")
    val out = fs.create(tmp, true)
    out.write(bytes); out.close()
    val won =
      if (fs.getScheme == "file") {
        val t = java.nio.file.Paths.get(tmp.toUri.getPath)
        val d = java.nio.file.Paths.get(dst.toUri.getPath)
        try { java.nio.file.Files.createLink(d, t); true }
        catch { case _: java.nio.file.FileAlreadyExistsException => false }
      } else fs.rename(tmp, dst)
    fs.delete(tmp, false)
    won
  }

  /** Optimistic-concurrency commit loop. `removes` must still be live
    * at the winning version's predecessor — appends (no removes) can
    * always retry; a compact whose victims were removed by a
    * concurrent commit aborts with ConcurrentModificationException.
    * `basedOn` makes a commit SERIALIZABLE against its read version:
    * replace-class commits (overwrite / replacePartitions / restore)
    * compute their remove-set against a snapshot, and if ANY commit
    * lands in between, "replace everything in scope" would silently
    * let the concurrent files survive — Delta aborts that as a write
    * conflict, and so does this (the caller re-reads and retries).
    */
  private[graft] def commit(action: String, adds: Seq[(String, Long)],
                            removes: Seq[String],
                            basedOn: Option[Long] = None): Long = {
    if (!fs.exists(logDir)) fs.mkdirs(logDir)
    var attempt = 0
    while (attempt < MaxRetries) {
      val prev = latestVersion
      basedOn.foreach { b =>
        if (prev != b) throw new java.util.ConcurrentModificationException(
          s"$action write conflict: table advanced v$b -> v$prev " +
            "while the replacement was being staged")
      }
      if (removes.nonEmpty) {
        val live = resolve(prev).keySet
        val gone = removes.filterNot(live)
        if (gone.nonEmpty) throw new java.util.ConcurrentModificationException(
          s"$action conflicts: files no longer live: ${gone.take(3).mkString(",")}")
      }
      val v = prev + 1
      val body = new StringBuilder(
        s"graft-commit\t$v\t$action\t${System.currentTimeMillis()}\n")
      adds.foreach { case (p, b) => body.append(s"add\t$p\t$b\n") }
      removes.foreach(p => body.append(s"remove\t$p\n"))
      if (publish(commitPath(v), body.toString.getBytes(UTF_8))) {
        if (v % CheckpointEvery == 0) {
          val live = resolve(v)
          val ck = live.toSeq.sorted
            .map { case (p, b) => s"file\t$p\t$b" }.mkString("", "\n", "\n")
          publish(ckptPath(v), ck.getBytes(UTF_8))
        }
        return v
      }
      attempt += 1 // lost the race — re-resolve and try the next version
    }
    sys.error(s"commit $action lost $MaxRetries consecutive version races")
  }

  /** Append `df` as a new commit; returns the committed version. */
  def append(df: DataFrame): Long = commit("append", stage(df), Seq.empty)

  /** Stage `df` hive-partitioned by `partCols`; relpaths carry the
    * partition directories (data/<uuid>/bucket=3/part-… ), which is
    * what lets replacePartitions/readPartitions prune at the LOG
    * level — no filesystem listing, no partition discovery scan.
    */
  private def stagePartitioned(df: DataFrame,
                               partCols: Seq[String]): Seq[(String, Long)] = {
    val sub = s"$DataDir/${java.util.UUID.randomUUID.toString.take(12)}"
    df.write.partitionBy(partCols: _*).parquet(s"$root/$sub")
    def walk(p: Path, rel: String): Seq[(String, Long)] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val r = s"$rel/${st.getPath.getName}"
        if (st.isDirectory) walk(st.getPath, r)
        else if (st.getPath.getName.endsWith(".parquet")) Seq((r, st.getLen))
        else Seq.empty
      }
    walk(new Path(rootPath, sub), sub)
  }

  /** Hive-partitioned append as ONE atomic (optionally
    * tagged-idempotent) commit — the partition-preserving form of
    * `append`/`appendIdempotent` for tables whose readers prune on a
    * partition column (the ANN index's cell-routed codes): the
    * commit's adds carry the partition directories, so
    * [[readPartitions]]/[[readPartitionedColumn]] prune at the log.
    */
  def appendPartitioned(df: DataFrame, partCol: String,
                        tag: String = null): Option[Long] =
    tagged("append", tag)(a =>
      commit(a, stagePartitioned(df, Seq(partCol)), Seq.empty))

  /** Replace the whole live set with `df`, hive-partitioned — the
    * partition-preserving `overwrite` (an index REBUILD commit).
    */
  def overwritePartitioned(df: DataFrame, partCol: String): Long = {
    val base = latestVersion
    val removes = resolve(base).keys.toSeq
    commit("overwrite", stagePartitioned(df, Seq(partCol)), removes,
      basedOn = Some(base))
  }

  /** The distinct values of a partition column across the live set,
    * parsed from the logged relpaths — no filesystem listing.
    */
  def partitionValues(partCol: String): Seq[Long] = {
    val pat = s"/${java.util.regex.Pattern.quote(partCol)}=(-?\\d+)/".r
    resolve(latestVersion).keys
      .flatMap(p => pat.findFirstMatchIn(p).map(_.group(1).toLong))
      .toSeq.distinct.sorted
  }

  /** Read the named partitions WITH the partition column restored:
    * ONE scan over the log-pruned file list, the value parsed back
    * from each row's file path (the partition dir is in the path by
    * stagePartitioned's construction) — no per-value scan fan-out,
    * no directory listing. None if nothing matches.
    */
  def readPartitionedColumn(partCol: String,
                            values: Seq[Long]): Option[DataFrame] = {
    import org.apache.spark.sql.functions.{input_file_name, regexp_extract}
    val live = resolve(latestVersion).keys
    val tokens = values.map(v => s"/$partCol=$v/")
    val files = live.filter(p => tokens.exists(p.contains)).toSeq.sorted
    if (files.isEmpty) None
    else Some(s.read.parquet(files.map(f => s"$root/$f"): _*)
      .withColumn(partCol,
        regexp_extract(input_file_name(),
          java.util.regex.Pattern.quote(s"/$partCol=") + "(-?\\d+)/", 1)
          .cast("long")))
  }

  /** Dynamic-partition-overwrite as ONE atomic commit (Delta's
    * replaceWhere): every live file under `partCol` ∈ `values` is
    * logically removed and `df`'s freshly-partitioned files take
    * their place — the bucket-registry MERGE shape (s7): a
    * micro-batch rewrites ONLY the partitions its keys hash into,
    * the untouched registry is never read or copied, and no reader
    * can observe the half-swapped state. `tag` makes a replayed
    * micro-batch a no-op (appendIdempotent's rule); pass null for an
    * untagged replace. Returns the version, or None if the tag was
    * already committed.
    */
  def replacePartitions(df: DataFrame, partCol: String, values: Seq[Long],
                        tag: String = null): Option[Long] =
    tagged("replace", tag) { action =>
      val base = latestVersion
      val tokens = values.map(v => s"/$partCol=$v/")
      val removes = resolve(base).keys
        .filter(p => tokens.exists(p.contains)).toSeq
      val adds = stagePartitioned(df, Seq(partCol))
      commit(action, adds, removes, basedOn = Some(base))
    }

  /** Read ONLY the named partitions' live files — pruned from the
    * log, so a probe of 2 of 1000 buckets opens 2 buckets' files and
    * never lists or plans the other 998. Empty result (no such
    * partitions yet) returns None — the caller supplies its own
    * empty frame with the right schema.
    */
  def readPartitions(partCol: String, values: Seq[Long]): Option[DataFrame] = {
    val tokens = values.map(v => s"/$partCol=$v/")
    val files = resolve(latestVersion).keys
      .filter(p => tokens.exists(p.contains)).toSeq.sorted
    if (files.isEmpty) None
    // no basePath/partition recovery: callers key on real columns and
    // re-derive the partition value (s7 recomputes pmod(user_id, n))
    else Some(s.read.parquet(files.map(f => s"$root/$f"): _*))
  }

  /** Exactly-once streaming append: the tag (a micro-batch id) is
    * recorded in the commit action, and a replayed batch whose tag is
    * already committed is a no-op — a checkpoint-restarted
    * foreachBatch sink lands each batch exactly once without any sink
    * -side dedup state. Tags are scanned from the durable log on
    * first use (restart-safe) and cached thereafter. Single writer
    * per tag namespace assumed (Structured Streaming's guarantee).
    */
  def appendIdempotent(df: DataFrame, tag: String): Option[Long] = {
    require(tag != null, "appendIdempotent needs a tag; use append")
    tagged("append", tag)(a => commit(a, stage(df), Seq.empty))
  }

  /** The ONE tagged-idempotence guard all four tagged verbs share:
    * validate the tag, no-op (running `onReplay`) if its action is
    * already committed, otherwise run `body` with the action string
    * and record it in the cache.
    */
  private def tagged(prefix: String, tag: String,
                     onReplay: () => Unit = () => ())
                    (body: String => Long): Option[Long] = {
    val action =
      if (tag == null) prefix
      else {
        require(!tag.exists(c => c == '\t' || c == '\n'), s"bad tag: $tag")
        s"$prefix@$tag"
      }
    if (tag != null && committedTags().contains(action)) { onReplay(); None }
    else {
      val v = body(action)
      tagCache.foreach(_ += action)
      Some(v)
    }
  }

  private var tagCache: Option[scala.collection.mutable.Set[String]] = None
  private def committedTags(): scala.collection.Set[String] =
    tagCache.getOrElse {
      val s0 = scala.collection.mutable.Set.empty[String]
      versions().foreach { v =>
        val a = readCommit(v).action
        if (a.contains("@")) s0 += a // append@<tag> / replace@<tag>
      }
      tagCache = Some(s0)
      s0
    }

  /** Replace the whole live set with `df` atomically. Serializable:
    * a commit landing between this call's snapshot and its publish
    * aborts it as a write conflict (its files would otherwise
    * silently survive the "replace everything").
    */
  def overwrite(df: DataFrame): Long = {
    val base = latestVersion
    val removes = resolve(base).keys.toSeq
    commit("overwrite", stage(df), removes, basedOn = Some(base))
  }

  /** OPTIMIZE: rewrite undersized live files (< targetBytes/2) into
    * ~targetBytes files in ONE atomic commit. Compliant files are not
    * touched — not even copied (they are already immutable table
    * files). File sizes come from the LOG, not a filesystem listing.
    * Content-neutral: the live row multiset is unchanged.
    */
  def compact(targetBytes: Long): Long = {
    require(targetBytes > 0, "targetBytes must be positive")
    val live = resolve(latestVersion).toSeq
    partColOf(live.map(_._1)).foreach { pc =>
      throw new IllegalArgumentException(
        s"table is hive-partitioned on '$pc' — a flat rewrite would drop " +
          s"the partition paths and break pruned reads; use " +
          s"compactPartitioned(\"$pc\", targetBytes)")
    }
    val small = live.filter(_._2 < targetBytes / 2)
    if (small.size <= 1) return latestVersion // nothing to gain
    val smallBytes = small.map(_._2).sum
    val nOut = math.max(1L, (smallBytes + targetBytes - 1) / targetBytes).toInt
    val merged = s.read
      .parquet(small.map(f => s"$root/${f._1}"): _*)
      .repartition(nOut)
    commit("compact", stage(merged), small.map(_._1))
  }

  /** The hive-partition column of the live set, if any — parsed from
    * the logged relpaths (stagePartitioned's construction).
    */
  private def partColOf(files: Iterable[String]): Option[String] = {
    val pat = "/([A-Za-z_][A-Za-z0-9_]*)=[^/]+/".r
    files.iterator.flatMap(f => pat.findFirstMatchIn(f).map(_.group(1)))
      .nextOption()
  }

  /** OPTIMIZE for a hive-partitioned table: undersized files rewrite
    * WITH their partition value (restored from the path, re-staged
    * under partition dirs), so pruned reads keep working — compact's
    * contract, partition-aware. One atomic commit.
    */
  def compactPartitioned(partCol: String, targetBytes: Long): Long = {
    require(targetBytes > 0, "targetBytes must be positive")
    import org.apache.spark.sql.functions.{col, input_file_name, regexp_extract}
    val live = resolve(latestVersion).toSeq
    val small = live.filter(_._2 < targetBytes / 2)
    if (small.size <= 1) return latestVersion
    val smallBytes = small.map(_._2).sum
    val nOut = math.max(1L, (smallBytes + targetBytes - 1) / targetBytes).toInt
    val merged = s.read
      .parquet(small.map(f => s"$root/${f._1}"): _*)
      .withColumn(partCol,
        regexp_extract(input_file_name(),
          java.util.regex.Pattern.quote(s"/$partCol=") + "(-?\\d+)/", 1)
          .cast("long"))
      .repartition(nOut, col(partCol))
    commit("compact", stagePartitioned(merged, Seq(partCol)),
      small.map(_._1))
  }

  /** OPTIMIZE ZORDER: rewrite the WHOLE live set z-ordered on
    * (dimA, dimB) — Delta's OPTIMIZE ZORDER BY semantics on the
    * commit log: one range exchange on the Morton value
    * (ZOrderLayout's closed-form spread arithmetic), one atomic
    * commit swapping every live file for ~numFiles z-clustered
    * files whose footer stats are selective on BOTH dimensions.
    * Content-neutral like compact; unlike compact it is layout-
    * driven, not size-driven — run it when downstream scans slice on
    * two columns, after ingest has accreted arrival-ordered files.
    */
  def compactZOrder(dimA: String, dimB: String, numFiles: Int): Long = {
    val live = resolve(latestVersion)
    require(live.nonEmpty, "cannot z-order an empty table")
    partColOf(live.keys).foreach { pc =>
      throw new IllegalArgumentException(
        s"table is hive-partitioned on '$pc' — a flat z-order rewrite " +
          "would drop the partition paths and break pruned reads")
    }
    val df = s.read.parquet(live.keys.toSeq.sorted.map(f => s"$root/$f"): _*)
    val sub = freshSub()
    ZOrderLayout.writeZOrdered(df,
      org.apache.spark.sql.functions.col(dimA),
      org.apache.spark.sql.functions.col(dimB),
      s"$root/$sub", numFiles)
    commit(s"zorder:$dimA,$dimB", listStaged(sub), live.keys.toSeq)
  }

  /** Adopt a caller-staged parquet directory as ONE atomic (and
    * optionally tagged-idempotent) append commit — for sinks whose
    * layout step has its own writer (s10's per-segment z-ordered
    * write): the caller writes the segment OUTSIDE the table, then
    * adoption is a single directory rename into `data/` plus the
    * commit, so readers never observe a partial segment. Tagged
    * adoption records the action as `append@tag` — it IS an append,
    * so the change feed and replay-idempotence rules apply to it
    * unchanged; a replayed tag deletes the staged dir and no-ops.
    */
  def adoptDir(stagedDir: String, tag: String = null): Option[Long] = {
    val staged = new Path(stagedDir)
    // replay: the segment is already in — drop the re-staged copy
    tagged("append", tag, onReplay = () => { fs.delete(staged, true); () }) {
      action =>
        val sub = freshSub()
        if (!fs.exists(new Path(rootPath, DataDir)))
          fs.mkdirs(new Path(rootPath, DataDir))
        require(fs.rename(staged, new Path(rootPath, sub)),
          s"adopt rename failed: $stagedDir -> $root/$sub")
        commit(action, listStaged(sub), Seq.empty)
    }
  }

  /** CHANGE FEED: the rows added by commits in (sinceVersion,
    * latest] — the incremental-consumer primitive (Delta CDF's
    * append slice): a downstream pass reads exactly the new data,
    * never the table. Exact for append-shaped history; a non-append
    * commit in the range (overwrite/compact/replace rewrites rows
    * that are not new) throws rather than serving a wrong feed —
    * the consumer must fall back to a snapshot diff (q51's shape).
    * Returns None when the range added nothing.
    */
  def changesSince(sinceVersion: Long,
                   untilVersion: Long = Long.MaxValue): Option[DataFrame] = {
    val until = math.min(untilVersion, latestVersion)
    val vs = versions().filter(v => v > sinceVersion && v <= until)
    // continuity: if vacuum dropped any commit in the range, the feed
    // would silently lose those rows (and couldn't even see a dropped
    // non-append commit to refuse it) — throw instead of serving a
    // wrong feed; the consumer falls back to a snapshot diff
    val missing = ((sinceVersion + 1) to until).filterNot(vs.contains)
    if (missing.nonEmpty) throw new IllegalStateException(
      s"change feed range ($sinceVersion, $until] has vacuumed commits: " +
        s"v${missing.head}..v${missing.last}")
    val commits = vs.map(readCommit)
    val nonAppend = commits.filterNot(_.action.startsWith("append"))
    if (nonAppend.nonEmpty) throw new IllegalStateException(
      s"change feed undefined across non-append commits: " +
        nonAppend.map(c => s"v${c.version}=${c.action}").mkString(","))
    val files = commits.flatMap(_.adds.map(_._1)).sorted
    if (files.isEmpty) None
    else Some(s.read.parquet(files.map(f => s"$root/$f"): _*))
  }

  /** Exactly-once incremental consumption of the change feed — the
    * log-following loop a downstream pipeline runs per schedule
    * (Delta's streaming model reduced to its batch essence): a
    * durable CURSOR (itself a tiny GraftTable ledger at `cursorDir`)
    * records the last version consumed; each call returns the rows
    * committed since then plus a commit callback that advances the
    * cursor — call order is load → process → `commit()`, so a crash
    * before commit re-presents the same batch (at-least-once into an
    * idempotent sink, IncrementalFiles' contract, here over TABLE
    * COMMITS instead of landed files). Propagates changesSince's
    * refusal of non-append ranges.
    */
  def nextChanges(cursorDir: String)
      : (Option[DataFrame], Long, Long, () => Unit) = {
    val cursor = GraftTable.forPath(s, cursorDir)
    val from =
      if (cursor.latestVersion == 0) 0L
      else cursor.read().agg(org.apache.spark.sql.functions.max("consumed_version"))
        .head.getLong(0)
    val to = latestVersion
    val df = if (to > from) changesSince(from, to) else None
    val commitFn = () => {
      import s.implicits._
      cursor.append(Seq(to).toDF("consumed_version").coalesce(1))
      ()
    }
    (df, from, to, commitFn)
  }

  /** RESTORE: make version `v`'s live set the CURRENT table state as
    * a new commit (Delta RESTORE) — a roll-forward undo, never a
    * history rewrite: the bad commits stay in the log for audit, the
    * restored state gets a fresh version, and no data file moves
    * (the old files are still on disk because removes are logical).
    */
  def restore(v: Long): Long = {
    val target = resolve(v)
    require(target.nonEmpty, s"cannot restore to empty/unknown version $v")
    val base = latestVersion
    val current = resolve(base).keySet
    val adds = target.toSeq.filterNot { case (p, _) => current(p) }
    val removes = (current -- target.keySet).toSeq
    commit(s"restore:$v", adds, removes, basedOn = Some(base))
  }

  /** Physically delete data files unreferenced by every retained
    * version (the newest `retainVersions`) and drop the older log
    * entries. Time travel before the horizon is gone after this —
    * the one destructive operation in the protocol. Also reclaims
    * ORPHANS: files staged by a writer that crashed before its
    * commit published (they are referenced by no version at all).
    * Retention is the caller's safety contract with LIVE readers:
    * a snapshot pinned at a version below the horizon reads files
    * vacuum may delete — choose `retainVersions` to exceed the age
    * of any reader still running (Delta's retention-window rule).
    */
  def vacuum(retainVersions: Int = 2,
             orphanGraceMillis: Long = 10L * 60 * 1000): Unit = {
    val vs = versions()
    if (vs.isEmpty) return // nothing committed: nothing to reclaim
    val keep = vs.takeRight(math.max(1, retainVersions))
    val referenced = keep.flatMap(v => resolve(v).keys).toSet
    // checkpoint the horizon so resolution never needs dropped entries
    val horizon = keep.head
    if (!fs.exists(ckptPath(horizon))) {
      val ck = resolve(horizon).toSeq.sorted
        .map { case (p, b) => s"file\t$p\t$b" }.mkString("", "\n", "\n")
      publish(ckptPath(horizon), ck.getBytes(UTF_8))
    }
    // full recursive sweep (partitioned tables nest value dirs under
    // data/<uuid>/). The grace window protects an IN-FLIGHT writer:
    // staged-but-not-yet-committed files are unreferenced by design
    // (data lands before the commit), and deleting them instantly
    // would let a vacuum racing a slow writer corrupt the commit that
    // writer is about to publish — only unreferenced files OLDER than
    // the window die (Delta's retention-age rule).
    val now = System.currentTimeMillis()
    def sweep(p: Path, rel: String): Unit =
      fs.listStatus(p).foreach { st =>
        val r = s"$rel/${st.getPath.getName}"
        if (st.isDirectory) sweep(st.getPath, r)
        else if (st.getPath.getName.endsWith(".parquet") &&
          !referenced(r) &&
          now - st.getModificationTime >= orphanGraceMillis)
          fs.delete(st.getPath, false)
      }
    val dataRoot = new Path(rootPath, DataDir)
    if (fs.exists(dataRoot)) sweep(dataRoot, DataDir)
    vs.filter(_ < horizon).foreach { v => fs.delete(commitPath(v), false) }
    checkpointVersions().filter(_ < horizon)
      .foreach(v => fs.delete(ckptPath(v), false))
  }
}

object GraftTable {
  private val LogDir = "_graft_log"
  private val DataDir = "data"
  private val VerPrefix = "v"
  private val CkptPrefix = "ckpt-v"
  private val Suffix = ".txt"
  private val CheckpointEvery = 8L
  private val MaxRetries = 64

  /** Create a table at `root` with `df` as version 1. */
  def create(s: SparkSession, root: String, df: DataFrame): GraftTable = {
    val t = new GraftTable(s, root)
    require(t.latestVersion == 0, s"table already exists at $root")
    t.append(df)
    t
  }

  /** Open an existing table (or a root about to receive version 1). */
  def forPath(s: SparkSession, root: String): GraftTable =
    new GraftTable(s, root)
}
