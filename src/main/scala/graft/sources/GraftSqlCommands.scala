package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}

/** The MAINTENANCE-STATEMENT SQL surface (Delta's `VACUUM` /
  * `OPTIMIZE` / `CLONE` / `GENERATE` statements): a tiny injected
  * parser recognizes the `GRAFT …` statement family and routes each
  * into the corresponding [[GraftTable]] verb as a runnable command —
  * execution happens exactly once at command run (never at analysis,
  * which Spark may repeat), and every other statement falls through
  * to Spark's own parser untouched.
  *
  * {{{
  *   GRAFT VACUUM '/data/t'                          -- verb defaults
  *   GRAFT VACUUM '/data/t' RETAIN 4 VERSIONS DRY RUN
  *   GRAFT OPTIMIZE '/data/t'                        -- 1 GiB target
  *   GRAFT OPTIMIZE '/data/t' TARGET 268435456
  *   GRAFT OPTIMIZE '/data/t' ZORDER BY (x, y)       -- Morton re-cluster
  *   GRAFT OPTIMIZE '/data/t' ZORDER BY (x, y, w) FILES 16  -- 2-4 dims
  *   GRAFT CLONE '/data/t' TO '/data/t_dev'          -- shallow clone
  *   GRAFT CLONE '/data/t' TO '/data/t_dev' VERSION AS OF 3
  *   GRAFT VACUUM '/data/t' RETAIN 48 HOURS          -- wall-clock window
  *   GRAFT GENERATE MANIFEST FOR '/data/t'
  *   GRAFT CONVERT '/data/plain_parquet_dir'        -- adopt in place
  *   GRAFT CONVERT '/data/d' PARTITIONED BY (country string)
  *   GRAFT RESTORE '/data/t' TO VERSION AS OF 3     -- roll-forward undo
  *   GRAFT RESTORE '/data/t' TO TIMESTAMP AS OF 1755…  -- epoch millis
  *   GRAFT DROP FEATURE deletionVectors FOR '/data/t'  -- protocol downgrade
  *   GRAFT REPLACE INTO '/data/t' WHERE (day = DATE '2026-01-01')
  *     AS SELECT ...                                 -- scoped backfill
  *   GRAFT FSCK '/data/t' [DRY RUN]                 -- drop missing refs
  * }}}
  *
  * All of these are driver-side O(log)-or-O(files) metadata
  * operations (OPTIMIZE additionally runs the undersized-file
  * rewrite job) — the statements cost what their verbs cost,
  * nothing more.
  */
object GraftSqlCommands {

  private val VacuumRe =
    """(?is)\s*GRAFT\s+VACUUM\s+'([^']+)'(?:\s+RETAIN\s+(\d+(?:\.\d+)?)\s+(VERSIONS|HOURS))?(\s+DRY\s+RUN)?\s*;?\s*""".r
  private val OptimizeRe =
    """(?is)\s*GRAFT\s+OPTIMIZE\s+'([^']+)'(?:\s+TARGET\s+(\d+))?\s*;?\s*""".r
  private val OptimizeWhereRe =
    """(?is)\s*GRAFT\s+OPTIMIZE\s+'([^']+)'\s+WHERE\s*\((.+?)\)\s*(?:ZORDER\s+BY\s*\(\s*(\w+(?:\s*,\s*\w+)+)\s*\))?(?:\s+(TARGET|FILES)\s+(\d+))?\s*;?\s*""".r
  /** One `col = v | col IN (…)` conjunct, optionally followed by
    * `AND <rest>` — the scope grammar of OPTIMIZE WHERE, parsed
    * sequentially so multi-key conjunctions address layout cells.
    */
  private val ConjRe =
    """(?is)^\s*(\w+)\s*(?:=\s*('[^']*'|-?\d+)|IN\s*\(((?:'[^']*'|[^)'])*)\))\s*(?:AND\s+(.+))?$""".r

  /** Quote-aware IN-list split: a quoted value may contain ',' or
    * ')' (`IN ('a,b', 'x)y')`) — a bare split(",") would tokenize it
    * wrong and the misread scope would silently no-op. Commas split
    * only OUTSIDE quotes; an unterminated quote refuses loudly.
    */
  private def splitInList(txt: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQ = false
    txt.foreach {
      case '\'' => inQ = !inQ; cur += '\''
      case ',' if !inQ => out += cur.toString; cur.clear()
      case c => cur += c
    }
    if (inQ) throw new IllegalArgumentException(
      s"GRAFT OPTIMIZE WHERE: unterminated quote in IN-list ($txt)")
    out += cur.toString
    out.toSeq.map(v => unquote(v.trim)).filter(_.nonEmpty)
  }

  private def parseScope(txt: String): Seq[(String, Seq[String])] =
    txt match {
      case ConjRe(c, eq, inList, rest) =>
        val vs =
          if (eq != null) Seq(unquote(eq))
          else splitInList(inList)
        (c -> vs) +: Option(rest).map(parseScope).getOrElse(Seq.empty)
      case _ => throw new IllegalArgumentException(
        s"GRAFT OPTIMIZE WHERE: cannot parse scope at '$txt' — expected " +
          "col = 'v' | col IN (…) [AND …]")
    }
  private val ZOrderRe =
    """(?is)\s*GRAFT\s+OPTIMIZE\s+'([^']+)'\s+ZORDER\s+BY\s*\(\s*(\w+(?:\s*,\s*\w+)+)\s*\)(?:\s+FILES\s+(\d+))?\s*;?\s*""".r
  private val CloneRe =
    """(?is)\s*GRAFT\s+CLONE\s+'([^']+)'\s+TO\s+'([^']+)'(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*;?\s*""".r
  private val ManifestRe =
    """(?is)\s*GRAFT\s+GENERATE\s+MANIFEST\s+FOR\s+'([^']+)'(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*;?\s*""".r
  private val FsckRe =
    """(?is)\s*GRAFT\s+FSCK\s+'([^']+)'(\s+DRY\s+RUN)?\s*;?\s*""".r
  private val ConvertRe =
    """(?is)\s*GRAFT\s+CONVERT\s+'([^']+)'(?:\s+PARTITIONED\s+BY\s*\(\s*([^)]+?)\s*\))?\s*;?\s*""".r
  private val RestoreRe =
    """(?is)\s*GRAFT\s+RESTORE\s+'([^']+)'\s+TO\s+(VERSION|TIMESTAMP)\s+AS\s+OF\s+(\d+)\s*;?\s*""".r
  private val DropFeatureRe =
    """(?is)\s*GRAFT\s+DROP\s+FEATURE\s+(\w+)\s+FOR\s+'([^']+)'\s*;?\s*""".r
  private val ReplaceIntoRe =
    """(?is)\s*GRAFT\s+REPLACE\s+INTO\s+'([^']+)'\s+WHERE\s*\((.+?)\)\s+AS\s+(SELECT\b.+?)\s*;?\s*""".r

  /** `'v'` → `v`; bare tokens pass through (the OPTIMIZE WHERE value
    * forms).
    */
  private def unquote(v: String): String =
    if (v.length >= 2 && v.head == '\'' && v.last == '\'')
      v.substring(1, v.length - 1)
    else v

  /** Some(plan) when `sqlText` is a graft maintenance statement. A
    * text that LEADS with GRAFT but matches no statement shape is a
    * loud error, never a silent fall-through to Spark (which would
    * produce a baffling parse error against the wrong grammar).
    */
  def maintenancePlan(sqlText: String): Option[LogicalPlan] =
    sqlText match {
      case VacuumRe(path, retain, unit, dry) =>
        // a fractional RETAIN count only means something for HOURS —
        // '1.5 VERSIONS' silently truncating to 1 would widen the
        // destructive horizon past what the statement said (ADVICE r13)
        if (Option(unit).forall(_.equalsIgnoreCase("VERSIONS")) &&
            Option(retain).exists(_.contains(".")))
          throw new IllegalArgumentException(
            s"GRAFT VACUUM: RETAIN $retain VERSIONS is not integral — " +
              "fractional retention only applies to HOURS")
        Some(GraftVacuumCommand(path,
          Option(retain).map(_.toDouble).getOrElse(2.0),
          Option(unit).forall(_.equalsIgnoreCase("VERSIONS")),
          dry != null))
      case ZOrderRe(path, dimList, files) => // before plain OPTIMIZE:
        // the broader regex would otherwise reject the ZORDER suffix
        Some(GraftZOrderCommand(path,
          dimList.split(",").toSeq.map(_.trim),
          Option(files).map(_.toInt).getOrElse(8)))
      case ReplaceIntoRe(path, pred, select) =>
        // Databricks' `INSERT INTO … REPLACE WHERE …` as a graft
        // statement: one serializable scoped replace fed by any SELECT
        // (parsed and planned by Spark itself at command RUN, never at
        // analysis — the parse-once discipline of the whole family)
        Some(GraftReplaceIntoCommand(path, pred, select))
      case OptimizeWhereRe(path, scopeTxt, dimList, kw, n) =>
        // partition-scoped OPTIMIZE (Delta's `OPTIMIZE ... WHERE`):
        // conjuncts of `col = v | col IN (...)` — multi-key ANDs
        // address a single cell — optionally composed with ZORDER BY
        // to re-cluster the matched partitions in place (round 15)
        val scope = parseScope(scopeTxt)
        if (dimList != null) {
          if (kw != null && kw.equalsIgnoreCase("TARGET"))
            throw new IllegalArgumentException(
              "GRAFT OPTIMIZE … WHERE … ZORDER BY takes FILES n, not " +
                "TARGET — a scoped z-order rewrites every matched file")
          Some(GraftZOrderWhereCommand(path, scope,
            dimList.split(",").toSeq.map(_.trim),
            Option(n).map(_.toInt).getOrElse(8)))
        } else {
          if (kw != null && kw.equalsIgnoreCase("FILES"))
            throw new IllegalArgumentException(
              "GRAFT OPTIMIZE … WHERE takes TARGET n (bytes), not FILES")
          Some(GraftOptimizeWhereCommand(path, scope,
            Option(n).map(_.toLong).getOrElse(1L << 30)))
        }
      case OptimizeRe(path, target) =>
        Some(GraftOptimizeCommand(path,
          Option(target).map(_.toLong).getOrElse(1L << 30)))
      case CloneRe(src, dst, v) =>
        Some(GraftCloneCommand(src, dst,
          Option(v).map(_.toLong).getOrElse(-1L)))
      case ManifestRe(path, v) =>
        Some(GraftManifestCommand(path,
          Option(v).map(_.toLong).getOrElse(-1L)))
      case ConvertRe(path, partList) =>
        // PARTITIONED BY (a t1, b t2) — ordered multi-key list
        val partBy = Option(partList).map(_.split(",").toSeq.map { e =>
          e.trim.split("\\s+") match {
            case Array(c, t) => (c, t)
            case _ => throw new IllegalArgumentException(
              s"GRAFT CONVERT: bad PARTITIONED BY entry '$e' — " +
                "expected 'col type'")
          }
        }).getOrElse(Seq.empty)
        Some(GraftConvertCommand(path, partBy))
      case RestoreRe(path, kind, n) =>
        Some(GraftRestoreCommand(path, n.toLong,
          kind.equalsIgnoreCase("TIMESTAMP")))
      case DropFeatureRe(feature, path) =>
        Some(GraftDropFeatureCommand(path, feature))
      case FsckRe(path, dry) =>
        Some(GraftFsckCommand(path, dry != null))
      case t if t.matches("""(?is)\s*GRAFT\s.*""") =>
        // any whitespace after GRAFT, matching the shape regexes — a
        // tab/newline-separated typo must hit THIS message, not fall
        // through to Spark's parser and its baffling generic error
        throw new IllegalArgumentException(
          "unrecognized GRAFT statement — supported: GRAFT VACUUM " +
            "'<path>' [RETAIN n VERSIONS|HOURS] [DRY RUN] | GRAFT " +
            "OPTIMIZE '<path>' [TARGET bytes | ZORDER BY (a, b) " +
            "[FILES n]] | GRAFT CLONE '<src>' TO '<dst>' [VERSION AS " +
            "OF n] | GRAFT GENERATE MANIFEST FOR '<path>' [VERSION AS " +
            "OF n] | GRAFT CONVERT '<dir>' [PARTITIONED BY (col type" +
            "[, col type])] | GRAFT OPTIMIZE '<path>' WHERE (col = " +
            "'v' | col IN ('a','b')) [TARGET bytes] " +
            "| GRAFT RESTORE '<path>' TO VERSION|TIMESTAMP AS OF n | " +
            "GRAFT DROP FEATURE <name> FOR '<path>' | " +
            "GRAFT FSCK '<path>' [DRY RUN]. " +
            "Paths are single-quoted and may not contain a quote " +
            "character — use the Scala verb API for such paths")
      case _ => None
    }
}

/** `GRAFT VACUUM`: the reclaim list (dry run) or the reclaim itself —
  * rows are the plan vacuum executes verbatim (vacuumPlan's
  * dry-run/execution can't-disagree contract). Uses the verb's
  * default 10-minute orphan grace: a DRY RUN shows exactly what an
  * immediate VACUUM would delete.
  */
case class GraftVacuumCommand(path: String, retain: Double,
                              retainIsVersions: Boolean,
                              dryRun: Boolean) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("kind", StringType, nullable = false)(),
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("bytes", LongType, nullable = false)())
  override def run(s: SparkSession): Seq[Row] = {
    val t = GraftTable.forPath(s, path)
    // RETAIN n HOURS (Delta's retention window) maps to a version
    // horizon via the commit wall-clocks, resolved ONCE here so the
    // dry-run rows and the execution below can't disagree
    val retainVersions =
      if (retainIsVersions) retain.toInt
      else t.retainVersionsForHours(retain)
    val p = t.vacuumPlan(retainVersions)
    // execute the EXACT plan the rows report — recomputing inside
    // vacuum() could reclaim files that aged past the grace window
    // (or a shifted horizon) between the two passes, making the
    // destructive statement under-report what it deleted
    if (!dryRun) t.vacuumExecute(p)
    p.files.map { case (r, b) => Row("file", r, b) } ++
      p.commits.map(v => Row("commit", f"v$v%012d", 0L)) ++
      p.checkpoints.map(v => Row("checkpoint", f"ckpt-v$v%012d", 0L))
  }
}

/** `GRAFT OPTIMIZE`: [[GraftTable.compact]] — one atomic commit
  * swapping undersized files, compliant files untouched. Returns the
  * table version after the command (unchanged when nothing was
  * undersized — compact's no-op contract).
  */
case class GraftOptimizeCommand(path: String, targetBytes: Long)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)())
  override def run(s: SparkSession): Seq[Row] =
    Seq(Row(GraftTable.forPath(s, path).compact(targetBytes)))
}

/** `GRAFT OPTIMIZE … ZORDER BY (a, b)`: [[GraftTable.compactZOrder]]
  * — Delta's OPTIMIZE ZORDER as a statement: one atomic commit
  * swapping the live set for ~FILES Morton-clustered files whose
  * footer stats prune on BOTH dimensions. Returns the new version.
  */
case class GraftZOrderCommand(path: String, dims: Seq[String],
                              numFiles: Int) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)())
  override def run(s: SparkSession): Seq[Row] =
    Seq(Row(GraftTable.forPath(s, path).compactZOrder(dims, numFiles)))
}

/** `GRAFT CLONE`: [[GraftTable.cloneTo]] — the zero-copy shallow
  * clone as a statement. Returns (source_version, dest_root).
  */
case class GraftCloneCommand(src: String, dst: String, version: Long)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("source_version", LongType, nullable = false)(),
    AttributeReference("dest_root", StringType, nullable = false)())
  override def run(s: SparkSession): Seq[Row] = {
    val t = GraftTable.forPath(s, src)
    // resolve latest ONCE and clone exactly that version — resolving
    // again inside cloneTo could clone a concurrent writer's newer
    // snapshot while reporting the older version number
    val v = if (version < 0) t.latestVersion else version
    t.cloneTo(dst, v)
    Seq(Row(v, dst))
  }
}

/** `GRAFT GENERATE MANIFEST FOR`: [[GraftTable.exportManifest]] —
  * returns the manifest file's path; inherits the verb's dv /
  * column-mapping / hive-partitioning refusals.
  */
case class GraftManifestCommand(path: String, version: Long)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("manifest_path", StringType, nullable = false)())
  override def run(s: SparkSession): Seq[Row] =
    Seq(Row(GraftTable.forPath(s, path).exportManifest(version)))
}

/** `GRAFT CONVERT '<dir>'`: [[GraftTable.convert]] — Delta's
  * `CONVERT TO DELTA` as a statement: adopt an existing plain-parquet
  * directory (flat or hive-partitioned) into the commit log in place,
  * no data rewritten. Returns the created version (always 1) and the
  * number of adopted files.
  */
case class GraftConvertCommand(path: String,
                               partBy: Seq[(String, String)] = Seq.empty)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("n_files", LongType, nullable = false)())
  override def run(s: SparkSession): Seq[Row] = {
    // PARTITIONED BY (col type[, col type]) — Delta CONVERT's explicit
    // partition schema: the declared ORDERED columns must match the
    // layout's key chain (convert validates name+order BEFORE the
    // commit is written, so a typo'd statement leaves nothing behind),
    // and each declared type overrides integral-vs-string inference
    val declared = partBy.map { case (c, tn) =>
      c -> org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        .parseDataType(tn)
    }
    val t = GraftTable.convert(s, path, declared)
    Seq(Row(t.latestVersion, t.liveFiles().size.toLong))
  }
}

/** `GRAFT OPTIMIZE '<p>' WHERE (col = 'v' | col IN (…)) [TARGET n]`:
  * partition-scoped compaction (Delta's `OPTIMIZE … WHERE`) —
  * [[GraftTable.compactPartitions]] rewrites undersized files ONLY
  * inside the named partitions; every other partition's files stay
  * byte-identical (not read, not listed). Returns the new version
  * (unchanged when nothing in scope was undersized).
  */
case class GraftOptimizeWhereCommand(path: String,
                                     scope: Seq[(String, Seq[String])],
                                     targetBytes: Long)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)())
  override def run(s: SparkSession): Seq[Row] =
    Seq(Row(GraftTable.forPath(s, path)
      .compactPartitionsWhere(scope, targetBytes)))
}

/** `GRAFT REPLACE INTO '<p>' WHERE (<pred>) AS SELECT …`:
  * [[GraftTable.replaceWhere]] as a statement (Databricks'
  * `INSERT INTO … REPLACE WHERE`): the SELECT runs through Spark's
  * own parser/planner at command run, the predicate must reference
  * only partition columns, incoming rows must satisfy it, untouched
  * partitions' files stay byte-identical — the verb's whole
  * contract, one statement. Returns the new version (null when an
  * idempotence tag made the replay a no-op — not applicable here;
  * the statement form is untagged).
  */
case class GraftReplaceIntoCommand(path: String, predicate: String,
                                   select: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)())
  override def run(s: SparkSession): Seq[Row] = {
    val df = s.sql(select)
    val v = GraftTable.forPath(s, path)
      .replaceWhere(org.apache.spark.sql.functions.expr(predicate), df)
    Seq(Row(v.getOrElse(-1L)))
  }
}

/** `GRAFT OPTIMIZE '<p>' WHERE (…) ZORDER BY (a, b) [FILES n]`:
  * [[GraftTable.zorderPartitions]] — re-cluster the matched
  * partitions in place (every matched file rewritten Morton-clustered
  * under its value-dir chain; out-of-scope files byte-identical).
  * Returns the new version.
  */
case class GraftZOrderWhereCommand(path: String,
                                   scope: Seq[(String, Seq[String])],
                                   dims: Seq[String],
                                   numFiles: Int)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)())
  override def run(s: SparkSession): Seq[Row] =
    Seq(Row(GraftTable.forPath(s, path)
      .zorderPartitions(scope, dims, numFiles)))
}

/** `GRAFT RESTORE '<path>' TO VERSION|TIMESTAMP AS OF n`: Delta's
  * RESTORE statement — a roll-forward undo commit
  * ([[GraftTable.restore]] / [[GraftTable.restoreTimestamp]]).
  * Returns the new version.
  */
case class GraftRestoreCommand(path: String, n: Long,
                               byTimestamp: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)())
  override def run(s: SparkSession): Seq[Row] = {
    val t = GraftTable.forPath(s, path)
    Seq(Row(if (byTimestamp) t.restoreTimestamp(n) else t.restore(n)))
  }
}

/** `GRAFT DROP FEATURE <name> FOR '<path>'`: Delta's `ALTER TABLE …
  * DROP FEATURE` — the explicit protocol-row downgrade, refused while
  * the feature is still active ([[GraftTable.dropFeature]]). Returns
  * the new version and the remaining protocol row.
  */
case class GraftDropFeatureCommand(path: String, feature: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("protocol", StringType, nullable = false)())
  override def run(s: SparkSession): Seq[Row] = {
    val t = GraftTable.forPath(s, path)
    val v = t.dropFeature(feature)
    Seq(Row(v, t.protocolAt(v).toSeq.sorted.mkString(",")))
  }
}

/** `GRAFT FSCK '<path>' [DRY RUN]`: [[GraftTable.fsck]] — drop
  * live-set references to data files deleted out-of-band so reads
  * stop failing; rows are the missing paths (dry run reports the
  * same rows and commits nothing).
  */
case class GraftFsckCommand(path: String, dryRun: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("missing_path", StringType, nullable = false)())
  override def run(s: SparkSession): Seq[Row] =
    GraftTable.forPath(s, path).fsck(dryRun).map(Row(_))
}

/** The injected parser: claims the `GRAFT …` statement family,
  * delegates EVERYTHING else (expressions, identifiers, schemas,
  * every non-GRAFT statement) to Spark's own parser unchanged.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlCommands.maintenancePlan(sqlText)
      .getOrElse(delegate.parsePlan(sqlText))
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
