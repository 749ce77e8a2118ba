package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sources.GraftTable

/** Oracled driver-contract entries for the [[graft.sources.GraftTable]]
  * transactional layer — the lakehouse lifecycle the reference leans on
  * its warehouse for (audit history `app.py:4826`, scheduled sync
  * `app.py:6754-6815`): append, OPTIMIZE, overwrite, then read the
  * table AS OF an earlier version.
  *
  * The lifecycle is fully deterministic from `orders` (no synthesized
  * data): v1 = 'F' rows, v2 = +'O' rows, v3 = compaction (content
  * neutral by contract), v4 = overwrite with 'P' rows only. q74 reads
  * version 2 — if time travel silently read the LATEST version the
  * hash would flip to the 'P'-only result, so the oracle match is a
  * real proof the log serves historical snapshots. q75 audits every
  * version's action and row count — compaction must hold its
  * predecessor's count exactly.
  *
  * The lifecycle builds once per (session, dataset) and is cached —
  * repeated bench/verify invocations re-read the committed log, they
  * do not re-commit (the same amortization other trained-model
  * entries use).
  */
object Lakehouse {

  private val built = scala.collection.concurrent.TrieMap.empty[String, GraftTable]

  /** The four-version lifecycle table for dataset `d`, built once. */
  private[graft] def lifecycle(s: SparkSession, d: String): GraftTable =
    built.synchronized { built.getOrElseUpdate(s.sparkContext.applicationId + "|" + d, {
      val root = java.nio.file.Files
        .createTempDirectory("graft_lakehouse").toString + "/orders_t"
      val orders = Tables.orders(s, d).select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      val t = GraftTable.create(s, root,
        orders.filter(col("o_orderstatus") === "F").repartition(6)) // v1
      t.append(orders.filter(col("o_orderstatus") === "O").repartition(6)) // v2
      // target derived from the actual staged sizes so the compact
      // ALWAYS commits (v3) at any SF — a fixed 1 GiB target would
      // no-op once staged files outgrow half of it, silently shifting
      // the q75 oracle's version numbering
      val target = math.max(1L << 30, t.liveFiles().map(_._2).max * 4)
      t.compact(target)                                                    // v3
      t.overwrite(orders.filter(col("o_orderstatus") === "P"))             // v4
      t
    }) }

  // q74: time travel — the table AS OF version 2 (F + O rows),
  // aggregated per status, even though the live version 4 holds only
  // 'P' rows. A broken log that served the latest snapshot (or a
  // compaction that leaked/dropped rows) cannot match this oracle.
  def q74TimeTravel(s: SparkSession, d: String): DataFrame =
    lifecycle(s, d).readVersion(2)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double").as("total_price"),
        min("o_orderdate").as("first_date"),
        max("o_orderdate").as("last_date"))
      .orderBy("o_orderstatus")

  // q75: the commit log as an audit table — every version's action
  // and exact row count. Proves append/compact/overwrite semantics
  // version by version: compact (v3) holds v2's count, overwrite
  // (v4) resets to the 'P' count.
  def q75TableHistory(s: SparkSession, d: String): DataFrame = {
    val t = lifecycle(s, d)
    import s.implicits._
    val actions = t.history().select("version", "action")
    val counts = t.versions()
      .map(v => (v, t.readVersion(v).count()))
      .toDF("version", "n_rows")
    actions.join(counts, "version")
      .select(col("version"), col("action"), col("n_rows"))
      .orderBy("version")
  }

  // q76: CHANGE FEED — the rows commit v2 added (exactly the 'O'
  // orders), served from the log's add-list without reading the
  // table: the incremental-consumer primitive (a downstream pass
  // reads only new data). The (1, 2] range is append-only by
  // construction; the feed refuses non-append ranges rather than
  // serving rewritten rows as new.
  def q76ChangeFeed(s: SparkSession, d: String): DataFrame =
    lifecycle(s, d).changesSince(1, untilVersion = 2).get
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double").as("total_price"))
      .orderBy("o_orderstatus")

  // q77: RESTORE — roll the table back to version 2 as a NEW commit
  // (no history rewrite, no file moves: logical removes made the old
  // files still live on disk), then read the current state: the
  // 'P'-only overwrite is undone and the F+O snapshot is current
  // again. Own table instance so the shared q74/q75 lifecycle's
  // audit history stays untouched.
  def q77Restore(s: SparkSession, d: String): DataFrame = {
    val t = restored.synchronized { restored.getOrElseUpdate(
      s.sparkContext.applicationId + "|" + d, {
        val root = java.nio.file.Files
          .createTempDirectory("graft_lakehouse_r").toString + "/t"
        val orders = Tables.orders(s, d).select(
          "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
        val t0 = GraftTable.create(s, root,
          orders.filter(col("o_orderstatus") === "F").repartition(4)) // v1
        t0.append(orders.filter(col("o_orderstatus") === "O"))        // v2
        t0.overwrite(orders.filter(col("o_orderstatus") === "P"))     // v3
        t0.restore(2)                                                 // v4
        t0
      }) }
    t.read()
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double").as("total_price"))
      .orderBy("o_orderstatus")
  }

  private val restored = scala.collection.concurrent.TrieMap.empty[String, GraftTable]

  // ---- row-level DML lifecycle (q78/q79/q80) --------------------------
  //
  // The copy-on-write MERGE/DELETE verbs exercised end-to-end and read
  // BACK FROM THE LOG — the reference's registry write path (`SaveData`
  // app.py:5253, `DeleteData` app.py:5216, `uploadExcel`
  // app.py:6063-6300) as transactional table commits:
  //   v1  create: the 'F' orders, range-staged on the key so files
  //       carry disjoint key ranges (what the DML prunes on);
  //   v2  merge:  every key ≡ 0 (mod 10) re-priced ×2 — non-'F' keys
  //       among them INSERT (update-only columns null-fill);
  //   v3  delete: keys ≤ max/4 with key ≡ 3 (mod 7) — a predicate the
  //       stats prune can bound to the low-range files.
  // All three queries hash-match DuckDB replaying the same algebra on
  // `orders`, so a DML that leaked rows, rewrote the wrong files, or
  // served stale snapshots cannot pass.
  private val dml = scala.collection.concurrent.TrieMap.empty[String, GraftTable]

  private[graft] def dmlLifecycle(s: SparkSession, d: String): GraftTable =
    dml.synchronized { dml.getOrElseUpdate(s.sparkContext.applicationId + "|" + d, {
      val root = java.nio.file.Files
        .createTempDirectory("graft_lakehouse_dml").toString + "/t"
      val orders = Tables.orders(s, d).select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
      val keyMax = orders.agg(max("o_orderkey")).head.getLong(0)
      val t = GraftTable.create(s, root,
        orders.filter(col("o_orderstatus") === "F")
          .repartitionByRange(8, col("o_orderkey")))               // v1
      val updates = orders.filter(pmod(col("o_orderkey"), lit(10)) === 0)
        .select(col("o_orderkey"),
          (col("o_totalprice") * 2).as("o_totalprice"))
      t.merge(updates, "o_orderkey")                               // v2
      t.deleteWhere(col("o_orderkey") <= lit(keyMax / 4) &&
        pmod(col("o_orderkey"), lit(7)) === 3)                     // v3
      t
    }) }

  // q78: MERGE INTO — the post-merge table read back from the commit
  // log at version 2: matched 'F' keys carry the doubled price,
  // unmatched keep theirs, update-only keys are inserted with a null
  // status. Full-row output: a merge that dropped, duplicated or
  // mis-resolved one row anywhere hash-fails.
  def q78MergeInto(s: SparkSession, d: String): DataFrame =
    dmlLifecycle(s, d).readVersion(2)

  // q79: DELETE WHERE — the current table after the copy-on-write
  // delete: exactly the merged state minus the predicate's rows,
  // read from the log (v3). GraftDmlSpec separately proves only
  // touched files were rewritten; this proves the surviving CONTENT.
  def q79DeleteWhere(s: SparkSession, d: String): DataFrame =
    dmlLifecycle(s, d).read()

  // q80: the ROW-LEVEL change feed over the DML range (1, 3]:
  // update_preimage/update_postimage/insert images from the merge,
  // delete images from the delete, aggregated per change type with
  // exact-decimal sums. Proves the staged CDF images — not the table —
  // reconstruct what changed (Delta CDF semantics).
  def q80CdfMerge(s: SparkSession, d: String): DataFrame =
    dmlLifecycle(s, d).changeFeed(1, untilVersion = 3).get
      .groupBy("_change_type")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double").as("total_price"),
        min("o_orderkey").as("min_key"),
        max("o_orderkey").as("max_key"))
      .orderBy("_change_type")

  // q81: metadata-only COUNT(*) — the DML lifecycle's final row count
  // answered from the add-action STATS in the commit log (zero scan,
  // zero Spark jobs; GraftDmlSpec asserts the no-job property via the
  // listener bus). Hash-matching DuckDB's real count over the same
  // algebra proves the whole stats pipeline end-to-end: stage-time
  // footer reads → commit add-actions → copy-on-write rewrites →
  // checkpointed resolution.
  def q81MetadataCount(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val t = dmlLifecycle(s, d)
    Seq(t.countRows().getOrElse(
      sys.error("live files missing stats — metadata count undefined")))
      .toDF("n_rows")
  }

  // q83: copy-on-write UPDATE (the third DML verb — the reference's
  // SaveData field edits): its own lifecycle table (all orders,
  // range-staged) so the shared q78-q82 lifecycle's versions stay
  // untouched; the UPDATE re-prices and re-flags a range-bounded key
  // slice, and the table read back from the log must hash-match
  // DuckDB's CASE-WHEN replay — matched rows updated, every other
  // row bit-identical passthrough.
  private val upd = scala.collection.concurrent.TrieMap.empty[String, GraftTable]

  def q83UpdateWhere(s: SparkSession, d: String): DataFrame = {
    val t = upd.synchronized { upd.getOrElseUpdate(s.sparkContext.applicationId + "|" + d, {
      val root = java.nio.file.Files
        .createTempDirectory("graft_lakehouse_upd").toString + "/t"
      val orders = Tables.orders(s, d).select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
      val keyMax = orders.agg(max("o_orderkey")).head.getLong(0)
      val t0 = GraftTable.create(s, root,
        orders.repartitionByRange(8, col("o_orderkey")))         // v1
      t0.update(
        col("o_orderkey") <= lit(keyMax / 4) &&
          pmod(col("o_orderkey"), lit(5)) === 0,
        Map("o_totalprice" -> (col("o_totalprice") * 1.5),
          "o_orderstatus" -> lit("U")))                          // v2
      t0
    }) }
    t.read()
  }

  // q82: the log-level DATA-SKIPPING read — the post-DML table read
  // through format("graft") with a selective key predicate, which the
  // delegating scan builder re-plans over only the stats-surviving
  // files (GraftDmlSpec asserts the planned-path subset; this entry
  // puts the pruned read's CONTENT under the DuckDB gate). The range
  // staging gives files disjoint key ranges, so the predicate prunes
  // most of them — a wrong survivor set cannot hash-match.
  def q82SkipRead(s: SparkSession, d: String): DataFrame = {
    val t = dmlLifecycle(s, d)
    val keyMax = Tables.orders(s, d).agg(max("o_orderkey")).head.getLong(0)
    s.read.format("graft").load(t.root)
      .filter(col("o_orderkey") <= keyMax / 8)
  }

  // ---- merge-on-read DML: deletion vectors (q84/q85) ------------------
  //
  // Delta's deletion-vector write path: DELETE/UPDATE mark rows dead in
  // a tiny positional sidecar instead of rewriting data files —
  //   v1  create: all orders, range-staged on the key;
  //   v2  MoR delete: a range-bounded key slice goes dead via dv
  //       (zero data files rewritten — GraftDvSpec asserts the file
  //       set is byte-identical);
  //   v3  MoR update: a second slice re-prices — old copies dead via
  //       dv, updated copies appended as a new slice file.
  // q84 reads the post-DML table through the dv-applying scan; q85
  // runs REORG … APPLY (PURGE) on its own instance and reads the
  // materialized table back through the DSv2 `format("graft")` path
  // (which refuses while dvs are live — purge reopens it). Both must
  // hash-match DuckDB replaying the same algebra: a dv scan that
  // resurrected one row, lost one position, or mis-keyed a file fails.
  private val morT = scala.collection.concurrent.TrieMap.empty[String, GraftTable]

  private def morLifecycle(s: SparkSession, d: String,
                           cache: scala.collection.concurrent.TrieMap[String, GraftTable],
                           tag: String): GraftTable =
    cache.synchronized { cache.getOrElseUpdate(s.sparkContext.applicationId + "|" + d, {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_lakehouse_$tag").toString + "/t"
      val orders = Tables.orders(s, d).select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
      val keyMax = orders.agg(max("o_orderkey")).head.getLong(0)
      val t0 = GraftTable.create(s, root,
        orders.repartitionByRange(8, col("o_orderkey")))          // v1
      t0.deleteWhere(col("o_orderkey") <= lit(keyMax / 4) &&
        pmod(col("o_orderkey"), lit(11)) === 4, mor = true)       // v2
      t0.update(
        col("o_orderkey") <= lit(keyMax / 2) &&
          pmod(col("o_orderkey"), lit(13)) === 6,
        Map("o_totalprice" -> (col("o_totalprice") * 0.5),
          "o_orderstatus" -> lit("M")), mor = true)               // v3
      t0
    }) }

  def q84DeleteVectors(s: SparkSession, d: String): DataFrame =
    morLifecycle(s, d, morT, "mor").read()

  private val purged = scala.collection.concurrent.TrieMap.empty[String, GraftTable]

  def q85ReorgPurge(s: SparkSession, d: String): DataFrame = {
    val t = morLifecycle(s, d, purged, "purge")
    if (t.hasDvAsOf(t.latestVersion)) t.purge()                   // v4
    s.read.format("graft").load(t.root)
  }

  // q86: SQL `UPDATE` — the statement form of q83's verb, routed by
  // the extensions-injected GraftRowLevelSql rule into the SAME
  // stats-pruned copy-on-write update commit ('SaveData' app.py:5253
  // as a SQL user would write it). The oracle replays the CASE
  // algebra; the table is read back THROUGH SQL so the whole
  // statement surface (catalog → analysis rewrite → commit → DSv2
  // read) is what's being hashed.
  private val sqlUpd = scala.collection.concurrent.TrieMap.empty[String, String]

  def q86SqlUpdate(s: SparkSession, d: String): DataFrame = {
    val root = sqlUpd.synchronized {
      sqlUpd.getOrElseUpdate(s.sparkContext.applicationId + "|" + d, {
        val r = java.nio.file.Files
          .createTempDirectory("graft_sql_upd").toString + "/t"
        val orders = Tables.orders(s, d).select(
          "o_orderkey", "o_orderstatus", "o_totalprice")
        val keyMax = orders.agg(max("o_orderkey")).head.getLong(0)
        GraftTable.create(s, r,
          orders.repartitionByRange(8, col("o_orderkey")))        // v1
        s.conf.set("spark.sql.catalog.gsql",
          classOf[graft.sources.GraftCatalog].getName)
        s.sql(s"UPDATE gsql.`$r` SET o_totalprice = o_totalprice * 1.25, " +
          s"o_orderstatus = 'S' " +
          s"WHERE o_orderkey <= ${keyMax / 4} AND o_orderkey % 6 = 1") // v2
        r
      })
    }
    s.conf.set("spark.sql.catalog.gsql",
      classOf[graft.sources.GraftCatalog].getName)
    s.sql(s"SELECT * FROM gsql.`$root`")
  }

  // q87: SQL `MERGE INTO` — the statement form of q78's verb (the
  // reference's bulk-upsert endpoints in SQL), routed into the
  // key-pruned merge commit. Matched keys re-price, unmatched keys
  // insert; oracle = the same full-outer-join algebra.
  def q87SqlMerge(s: SparkSession, d: String): DataFrame = {
    val root = sqlUpd.synchronized {
      sqlUpd.getOrElseUpdate("m|" + s.sparkContext.applicationId + "|" + d, {
        val r = java.nio.file.Files
          .createTempDirectory("graft_sql_mrg").toString + "/t"
        val orders = Tables.orders(s, d).select(
          "o_orderkey", "o_orderstatus", "o_totalprice")
        GraftTable.create(s, r, orders
          .filter(col("o_orderstatus") === "O")
          .repartitionByRange(8, col("o_orderkey")))              // v1
        orders.filter(pmod(col("o_orderkey"), lit(9)) === 0)
          .withColumn("o_totalprice", col("o_totalprice") * 3)
          .createOrReplaceTempView("q87_batch")
        s.conf.set("spark.sql.catalog.gsql",
          classOf[graft.sources.GraftCatalog].getName)
        s.sql(s"MERGE INTO gsql.`$r` t USING q87_batch s " +
          "ON t.o_orderkey = s.o_orderkey " +
          "WHEN MATCHED THEN UPDATE SET * " +
          "WHEN NOT MATCHED THEN INSERT *")                       // v2
        r
      })
    }
    s.conf.set("spark.sql.catalog.gsql",
      classOf[graft.sources.GraftCatalog].getName)
    s.sql(s"SELECT * FROM gsql.`$root`")
  }

  // q89: SHALLOW CLONE (Delta CLONE) — a zero-copy metadata-only
  // commit references the source's files by absolute path, then the
  // clone diverges through its own copy-on-write DML while the source
  // stays bit-identical. The result hashes BOTH sides' aggregates, so
  // a clone that copied nothing but leaked DML into the source (or a
  // clone that silently re-read the live source instead of its own
  // log) flips the 'source' rows and cannot match. Zero-copy is
  // asserted at build time: not one parquet lands under the clone
  // root before its first DML. At 100 TB this is the whole point —
  // cloning costs one O(files) log write, and only the files the
  // clone's own DML touches are ever rewritten (localized).
  private val cloned = scala.collection.concurrent.TrieMap
    .empty[String, (GraftTable, GraftTable)]

  def q89ShallowClone(s: SparkSession, d: String): DataFrame = {
    val (src, cl) = cloned.synchronized {
      cloned.getOrElseUpdate(s.sparkContext.applicationId + "|" + d, {
        val base = java.nio.file.Files
          .createTempDirectory("graft_clone_q").toString
        val orders = Tables.orders(s, d).select(
          "o_orderkey", "o_orderstatus", "o_totalprice")
        val t = GraftTable.create(s, s"$base/src",
          orders.filter(col("o_orderstatus") === "F")
            .repartitionByRange(6, col("o_orderkey")))             // v1
        t.append(orders.filter(col("o_orderstatus") === "O"))      // v2
        val c = t.cloneTo(s"$base/clone")                          // clone v1
        val walk = java.nio.file.Files.walk(
          java.nio.file.Paths.get(s"$base/clone"))
        val copied = try walk.toArray.exists(
          _.toString.endsWith(".parquet")) finally walk.close()
        require(!copied, "shallow clone staged data files — not zero-copy")
        c.deleteWhere(pmod(col("o_orderkey"), lit(7)) === 0)       // clone v2
        require(t.latestVersion == 2,
          s"clone DML advanced the source log to v${t.latestVersion}")
        (t, c)
      })
    }
    sideBySide(statusAgg(src.read(), "source"),
      statusAgg(cl.read(), "clone"))
  }

  /** The shared two-table comparison shape q89/q90 hash: per-status
    * counts and decimal-exact totals, tagged by side. ONE definition
    * so the rounding/cast contract cannot silently diverge between
    * the clone entries.
    */
  private def statusAgg(df: DataFrame, tag: String): DataFrame =
    df.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double").as("total_price"))
      .select(lit(tag).as("side"), col("o_orderstatus"),
        col("n_orders"), col("total_price"))

  private def sideBySide(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).orderBy("side", "o_orderstatus")

  // q90: the MAINTENANCE-STATEMENT SQL surface end-to-end — the
  // operations-engineer flow issued exactly as SQL: ingest lands
  // fragmented (8 undersized files), `GRAFT OPTIMIZE` compacts them
  // in one content-neutral commit, `GRAFT CLONE` forks a dev copy,
  // a DML diverges the clone, and the result reads BOTH tables back
  // through the SQL catalog — so the hash covers the injected
  // parser, the runnable commands, the clone isolation AND the
  // serving reads. The oracle replays the content algebra (OPTIMIZE
  // is content-neutral by contract; a compaction that leaked or
  // duplicated a row cannot match).
  private val sqlMaint = scala.collection.concurrent.TrieMap.empty[String, (String, String)]

  def q90SqlMaintenance(s: SparkSession, d: String): DataFrame = {
    val (src, cl) = sqlMaint.synchronized {
      sqlMaint.getOrElseUpdate(s.sparkContext.applicationId + "|" + d, {
        val base = java.nio.file.Files
          .createTempDirectory("graft_sql_maint").toString
        val orders = Tables.orders(s, d).select(
          "o_orderkey", "o_orderstatus", "o_totalprice")
        val t = GraftTable.create(s, s"$base/src",
          orders.filter(col("o_orderstatus") =!= "P").repartition(8)) // v1
        // target derived from the actual staged sizes (the q74
        // lifecycle's rule): a fixed 1 GiB default would NO-OP once
        // the 8 files each outgrow half of it, and the require below
        // would abort the query at a large-enough SF
        val target = math.max(1L << 30, t.liveFiles().map(_._2).max * 4)
        s.sql(s"GRAFT OPTIMIZE '$base/src' TARGET $target")           // v2
        require(t.liveFiles().size < 8,
          "GRAFT OPTIMIZE left the fragmented layout in place")
        s.sql(s"GRAFT CLONE '$base/src' TO '$base/dev'")              // dev v1
        GraftTable.forPath(s, s"$base/dev")
          .deleteWhere(pmod(col("o_orderkey"), lit(3)) === 0)         // dev v2
        require(t.latestVersion == 2,
          "clone DML advanced the source log")
        (s"$base/src", s"$base/dev")
      })
    }
    s.conf.set("spark.sql.catalog.gsql",
      classOf[graft.sources.GraftCatalog].getName)
    sideBySide(
      statusAgg(s.sql(s"SELECT * FROM gsql.`$src`"), "source"),
      statusAgg(s.sql(s"SELECT * FROM gsql.`$cl`"), "dev"))
  }

  private val conv = scala.collection.concurrent.TrieMap.empty[String, GraftTable]

  // q91: CONVERT — adopt a PLAIN parquet directory into the commit
  // log in place (Delta's CONVERT TO DELTA; the migration verb a
  // reference user runs first), then prove the converted table is a
  // full citizen: a copy-on-write DELETE retires converted originals
  // logically (v2), and the final read serves the post-DML snapshot
  // through the log. A convert that dropped/duplicated files, a DML
  // that resurrected retired originals, or stats recorded against
  // the wrong paths cannot hash-match. Built once per (session,
  // dataset) like the other lifecycle entries; the adoption itself
  // is the SQL statement (`GRAFT CONVERT`), so the statement path is
  // what verify exercises.
  private def convertedTable(s: SparkSession, d: String): GraftTable =
    conv.synchronized { conv.getOrElseUpdate(s.sparkContext.applicationId + "|" + d, {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_convert").toString + "/plain"
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_partkey", "l_quantity", "l_returnflag")
        .repartition(4).write.parquet(dir)                         // plain
      // Spark's parquet job leaves a _SUCCESS marker — convert must
      // skip non-parquet/underscore entries (part of the contract)
      s.sql(s"GRAFT CONVERT '$dir'")                               // v1
      val t = GraftTable.forPath(s, dir)
      t.deleteWhere(pmod(col("l_orderkey"), lit(10)) === 3)        // v2
      t
    }) }

  private val strParted = scala.collection.concurrent.TrieMap.empty[String, GraftTable]

  // q93: STRING-VALUED PARTITION COLUMNS end-to-end (the round-13
  // capability wall: the reference's Master_data is string-keyed —
  // Country/Source columns, app.py's Master_data.csv — and real lakes
  // are full of lang=en/ layouts). The lifecycle: a plain parquet
  // landing hive-partitioned by c_mktsegment (string value dirs),
  // adopted in place by GRAFT CONVERT (which RECORDS the key's type —
  // the partmeta row), then a copy-on-write DELETE whose rewrite must
  // restore the string values from the paths and re-stage survivors
  // UNDER their value dirs, and finally a log-PRUNED read of three
  // named segments with the partition column restored. An adoption
  // that inferred long (null values), a DML that restaged under
  // c_mktsegment=null, or a pruned read that missed rewritten files
  // cannot hash-match the oracle. Built once per (session, dataset).
  private def strPartTable(s: SparkSession, d: String): GraftTable =
    strParted.synchronized { strParted.getOrElseUpdate(s.sparkContext.applicationId + "|" + d, {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_strpart").toString + "/plain"
      Tables.customer(s, d)
        .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
        .write.partitionBy("c_mktsegment").parquet(dir)            // plain
      s.sql(s"GRAFT CONVERT '$dir' PARTITIONED BY (c_mktsegment string)")
      val t = GraftTable.forPath(s, dir)                           // v1
      t.deleteWhere(col("c_acctbal") < 0)                          // v2
      t
    }) }

  def q93StringPartition(s: SparkSession, d: String): DataFrame =
    strPartTable(s, d)
      .readPartitionedColumnString("c_mktsegment",
        Seq("AUTOMOBILE", "BUILDING", "MACHINERY"))
      .get
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_cust"),
        sum(col("c_acctbal").cast("decimal(18,2)"))
          .cast("double").as("total_bal"),
        min("c_custkey").as("first_key"))
      .orderBy("c_mktsegment")

  private val dateParted = scala.collection.concurrent.TrieMap.empty[String, GraftTable]

  // q94: DATE-TYPED partition keys through the same lifecycle as q93
  // (the other half of the real-lake layout space: date=2026-08-15/
  // dirs are THE standard fact-table layout). Year-start dates keep
  // the partition count lifecycle-sized; the CONVERT declares the
  // type explicitly (dates are non-integral, so inference would say
  // string — Delta's PARTITIONED BY contract is exactly for this),
  // the copy-on-write DELETE restores real DATE values from the
  // paths and restages under them, and the pruned 3-year read
  // returns the key as a DATE column the oracle groups on.
  private def datePartTable(s: SparkSession, d: String): GraftTable =
    dateParted.synchronized { dateParted.getOrElseUpdate(s.sparkContext.applicationId + "|" + d, {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_datepart").toString + "/plain"
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"),
          expr("cast(date_trunc('year', o_orderdate) as date)")
            .as("oyear"))
        .write.partitionBy("oyear").parquet(dir)                   // plain
      s.sql(s"GRAFT CONVERT '$dir' PARTITIONED BY (oyear date)")   // v1
      val t = GraftTable.forPath(s, dir)
      t.deleteWhere(col("o_totalprice") < 1000.0)                  // v2
      t
    }) }

  def q94DatePartition(s: SparkSession, d: String): DataFrame =
    datePartTable(s, d)
      .readPartitionedColumnString("oyear",
        Seq("1996-01-01", "1998-01-01", "2000-01-01"))
      .get
      .groupBy("oyear")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double").as("total_price"),
        min("o_orderkey").as("first_key"))
      .orderBy("oyear")

  private val sqlParted = scala.collection.concurrent.TrieMap.empty[String, String]

  // q96: the PARTITIONED SQL WRITE lifecycle end-to-end (round 14):
  // `CREATE TABLE … PARTITIONED BY (ostatus)` records the key at
  // create, a dynamic-partition `INSERT INTO … SELECT` routes every
  // order under its escaped status value dir through the v2 batch
  // writer (clustered distribution + one staged-files commit), a SQL
  // UPDATE keyed on the PATH-BORNE column rewrites only the matched
  // partition's files copy-on-write, and the serving read comes back
  // through the catalog with the key restored by the log-backed
  // index. A writer that dropped the partition routing, an UPDATE
  // that lost the key column, or a restore that mis-parsed the value
  // dirs cannot hash-match DuckDB replaying the same algebra on
  // `orders`. Built once per (session, dataset).
  private def sqlPartTable(s: SparkSession, d: String): String =
    sqlParted.synchronized { sqlParted.getOrElseUpdate(s.sparkContext.applicationId + "|" + d, {
      val root = java.nio.file.Files
        .createTempDirectory("graft_sqlpart").toString + "/t"
      s.conf.set("spark.sql.catalog.gsqlw",
        classOf[graft.sources.GraftCatalog].getName)
      s.sql(s"CREATE TABLE gsqlw.`$root` (o_orderkey BIGINT, " +
        "o_totalprice DOUBLE, ostatus STRING) " +
        "PARTITIONED BY (ostatus)")                                // v1
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderstatus").as("ostatus"))
        .createOrReplaceTempView("q96_src")
      s.sql(s"INSERT INTO gsqlw.`$root` SELECT * FROM q96_src")    // v2
      s.sql(s"UPDATE gsqlw.`$root` SET o_totalprice = " +
        "o_totalprice * 2 WHERE ostatus = 'P'")                    // v3
      root
    }) }

  def q96SqlPartitioned(s: SparkSession, d: String): DataFrame = {
    val root = sqlPartTable(s, d)
    s.sql(s"SELECT * FROM gsqlw.`$root`")
      .groupBy("ostatus")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double").as("total_price"),
        min("o_orderkey").as("first_key"))
      .orderBy("ostatus")
  }

  private val twoKeyParted = scala.collection.concurrent.TrieMap.empty[String, GraftTable]

  // q95: MULTI-COLUMN partition keys end-to-end (the round-14
  // capability wall, one dimension up from q93/q94's single keys: the
  // reference's Master_data is (Country, Source)-keyed, and real fact
  // layouts are date=…/hour=…). The lifecycle: a plain parquet
  // landing hive-partitioned by (ostatus string, oyear date) — a
  // two-level, mixed-TYPE value-dir chain — adopted in place by GRAFT
  // CONVERT PARTITIONED BY (a t1, b t2) (which records the ORDERED
  // key list in the partmeta row), then a copy-on-write DELETE whose
  // rewrite must restore BOTH keys from the paths and re-stage
  // survivors under the full two-level chain, and finally two
  // log-PRUNED reads — one keyed on the OUTER key, one on the INNER —
  // each restoring both partition columns. An adoption that dropped a
  // key, a DML that restaged under one level, or an inner-key prune
  // that missed rewritten files cannot hash-match the oracle.
  private def twoKeyTable(s: SparkSession, d: String): GraftTable =
    twoKeyParted.synchronized { twoKeyParted.getOrElseUpdate(s.sparkContext.applicationId + "|" + d, {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_twokey").toString + "/plain"
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderstatus").as("ostatus"),
          expr("cast(date_trunc('year', o_orderdate) as date)")
            .as("oyear"))
        .write.partitionBy("ostatus", "oyear").parquet(dir)        // plain
      s.sql(s"GRAFT CONVERT '$dir' " +
        "PARTITIONED BY (ostatus string, oyear date)")             // v1
      val t = GraftTable.forPath(s, dir)
      t.deleteWhere(col("o_totalprice") < 1000.0)                  // v2
      t
    }) }

  def q95MultiPartition(s: SparkSession, d: String): DataFrame = {
    val t = twoKeyTable(s, d)
    def shaped(df: DataFrame, probe: String) = df
      .groupBy("ostatus", "oyear")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double").as("total_price"),
        min("o_orderkey").as("first_key"))
      .select(lit(probe).as("probe"), col("ostatus"), col("oyear"),
        col("n_orders"), col("total_price"), col("first_key"))
    // prune on the OUTER key alone, then on the INNER key alone —
    // both reads restore both columns from the paths
    val byStatus = shaped(
      t.readPartitionedColumnString("ostatus", Seq("F")).get,
      "by_status")
    val byYear = shaped(
      t.readPartitionedColumnString("oyear",
        Seq("1996-01-01", "1997-01-01")).get,
      "by_year")
    byStatus.unionByName(byYear).orderBy("probe", "ostatus", "oyear")
  }

  private val backfilled = scala.collection.concurrent.TrieMap.empty[String, String]

  // q97: DYNAMIC PARTITION OVERWRITE + replaceWhere — the daily-
  // backfill lifecycle (round-15 verdict item 2; the reference's
  // Master_data monthly re-land is the motivating shape): orders land
  // hive-partitioned by year-period, then period 1996 is RESTATED
  // dynamically — `overwritePartitionsDynamic` replaces exactly the
  // chains present in the incoming batch, nothing hand-enumerated —
  // and period 1997 is restated through `replaceWhere` (the predicate
  // names the scope; rows violating it refuse before staging). Both
  // are ONE serializable 'replace' commit each; every other period's
  // files stay byte-identical (GraftReplaceWhereSpec pins that). The
  // serving read is the DSv2 snapshot with the key restored by the
  // log-backed index. A dynamic overwrite that leaked into other
  // periods, a replaceWhere that dropped unmatched files, or a
  // restatement applied to the wrong period cannot hash-match DuckDB
  // replaying the same algebra on `orders`. Built once per
  // (session, dataset); INTEGER restatement factors (2 / 3) keep the
  // restated prices exact 2-decimal values, so the oracle's decimal
  // cast never rounds (fractional factors hit binary-exact
  // third-decimal-5 ties, where Spark rounds HALF_UP and DuckDB
  // HALF_EVEN — measured 1.35/2.06 sum drift at sf0.01).
  private def backfillTable(s: SparkSession, d: String): String =
    backfilled.synchronized { backfilled.getOrElseUpdate(
      s.sparkContext.applicationId + "|" + d,
      graft.tools.BuildCosts.timed("build:q97_backfill_lifecycle") {
        val dir = java.nio.file.Files
          .createTempDirectory("graft_backfill").toString + "/t"
        val t = GraftTable.forPath(s, dir)
        def src = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_totalprice"),
            expr("cast(date_trunc('year', o_orderdate) as date)")
              .as("oyear"))
        t.appendPartitioned(src, "oyear")                          // v1
        t.overwritePartitionsDynamic(
          src.filter(expr("year(oyear) = 1996"))
            .withColumn("o_totalprice", col("o_totalprice") * 2.0))  // v2
        t.replaceWhere(col("oyear") === lit("1997-01-01").cast("date"),
          src.filter(expr("year(oyear) = 1997"))
            .withColumn("o_totalprice", col("o_totalprice") * 3.0))  // v3
        dir
      }) }

  def q97Backfill(s: SparkSession, d: String): DataFrame =
    s.read.format("graft").load(backfillTable(s, d))
      .groupBy("oyear")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double").as("total_price"),
        min("o_orderkey").as("first_key"))
      .orderBy("oyear")

  private val zordered = scala.collection.concurrent.TrieMap.empty[String, String]

  // q98: the SCOPED-ZORDER lifecycle ORACLED (round 15, verdict item
  // 3's statement surface inside the driver gate — q90's precedent:
  // the oracle proves CONTENT NEUTRALITY, the spec proves the layout):
  // orders land hive-partitioned by status with deliberately
  // fragmented arrival-ordered files, the hot partition re-clusters
  // in place via `GRAFT OPTIMIZE … WHERE (ostatus = 'F') ZORDER BY
  // (o_orderkey, o_custkey) FILES 4`, the cold partitions compact via
  // the multi-conjunct `WHERE (ostatus IN ('O','P'))`, and the
  // serving read aggregates the whole table — a zorder that dropped
  // or duplicated rows, restaged under wrong value dirs, or leaked
  // into unmatched partitions cannot hash-match DuckDB replaying the
  // plain algebra on `orders`. Built once per (session, dataset).
  private def zorderedTable(s: SparkSession, d: String): String =
    zordered.synchronized { zordered.getOrElseUpdate(
      s.sparkContext.applicationId + "|" + d,
      graft.tools.BuildCosts.timed("build:q98_zorder_lifecycle") {
        val dir = java.nio.file.Files
          .createTempDirectory("graft_zorder98").toString + "/t"
        val t = GraftTable.forPath(s, dir)
        t.appendPartitioned(Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice"), col("o_orderstatus").as("ostatus"))
          .repartition(6), "ostatus")                              // v1
        s.sql(s"GRAFT OPTIMIZE '$dir' WHERE (ostatus = 'F') " +
          "ZORDER BY (o_orderkey, o_custkey) FILES 4")             // v2
        s.sql(s"GRAFT OPTIMIZE '$dir' WHERE (ostatus IN ('O', 'P')) " +
          s"TARGET ${64L << 20}")                                  // v3
        dir
      }) }

  def q98ScopedZorder(s: SparkSession, d: String): DataFrame =
    s.read.format("graft").load(zorderedTable(s, d))
      .groupBy("ostatus")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double").as("total_price"),
        min("o_orderkey").as("first_key"),
        countDistinct("o_custkey").as("n_cust"))
      .orderBy("ostatus")

  private val replaceCdfd = scala.collection.concurrent.TrieMap.empty[String, GraftTable]

  // q100: CDF ACROSS A REPLACE COMMIT (round 16, the r15 verdict's
  // item 2): the q97 backfill shape — orders partitioned by
  // year-period, period 1997 restated (×3, the integer-factor rule)
  // through replaceWhere — but written with `cdfImages = true`
  // (Delta's CDF-enablement), so the commit stages `delete` images
  // for every replaced row and `insert` images for the incoming
  // batch, and the row-level feed SERVES the backfill range instead
  // of refusing. The serving read aggregates the feed per change
  // type with exact-decimal sums — an incremental consumer downstream
  // of the monthly re-land (the reference's `sync_tags` app.py:6631)
  // replays exactly these deltas instead of full-rebuilding. Wrong
  // image sides, leaked out-of-scope rows, or a missed restatement
  // factor cannot hash-match DuckDB building both image sets from
  // `orders` directly.
  private def replaceCdfTable(s: SparkSession, d: String): GraftTable =
    replaceCdfd.synchronized { replaceCdfd.getOrElseUpdate(
      s.sparkContext.applicationId + "|" + d,
      graft.tools.BuildCosts.timed("build:q100_replace_cdf_lifecycle") {
        val dir = java.nio.file.Files
          .createTempDirectory("graft_replacecdf").toString + "/t"
        val t = GraftTable.forPath(s, dir)
        def src = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_totalprice"),
            expr("cast(date_trunc('year', o_orderdate) as date)")
              .as("oyear"))
        t.appendPartitioned(src, "oyear")                          // v1
        t.replaceWhere(col("oyear") === lit("1997-01-01").cast("date"),
          src.filter(expr("year(oyear) = 1997"))
            .withColumn("o_totalprice", col("o_totalprice") * 3.0),
          cdfImages = true)                                        // v2
        t
      }) }

  def q100ReplaceCdf(s: SparkSession, d: String): DataFrame =
    replaceCdfTable(s, d).changeFeed(1, 2).get
      .groupBy("_change_type")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double").as("total_price"),
        min("o_orderkey").as("min_key"),
        max("o_orderkey").as("max_key"))
      .orderBy("_change_type")

  private val evolveMerged = scala.collection.concurrent.TrieMap.empty[String, GraftTable]

  // q101: DML SCHEMA EVOLUTION (round 16, the r15 verdict's item 3;
  // the reference's Excel uploads grow columns — `uploadExcel`
  // app.py:6063 — and the upsert must carry them): a flat orders
  // registry merges a batch carrying a BRAND-NEW column (`o_flag`)
  // plus one new key, with `mergeSchema = true` (Delta's
  // schema.autoMerge). Only touched files rewrite and materialize the
  // column; untouched files stay byte-identical (GraftDmlSpec pins
  // that) and the snapshot read null-fills them — so the serving
  // full-row read has `o_flag` exactly on the batch's rows and NULL
  // everywhere else. DuckDB replays the same left-join/anti-join
  // algebra; a merge that dropped the new column, filled it on the
  // wrong rows, or rewrote untouched files into the new shape
  // differently cannot hash-match.
  private def evolveMergeTable(s: SparkSession, d: String): GraftTable =
    evolveMerged.synchronized { evolveMerged.getOrElseUpdate(
      s.sparkContext.applicationId + "|" + d,
      graft.tools.BuildCosts.timed("build:q101_merge_evolve_lifecycle") {
        val dir = java.nio.file.Files
          .createTempDirectory("graft_evolve").toString + "/t"
        val orders = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_totalprice"))
        val t = GraftTable.create(s, dir,
          orders.repartitionByRange(8, col("o_orderkey")))         // v1
        val keyMax = orders.agg(max("o_orderkey")).head().getLong(0)
        val batch = Tables.orders(s, d)
          .filter(pmod(col("o_orderkey"), lit(7L)) === 0)
          .select(col("o_orderkey"),
            (col("o_totalprice") * 2).as("o_totalprice"),
            col("o_orderstatus").as("o_flag"))
          .unionByName(s.range(1, 2).select(
            (lit(keyMax) + lit(5L)).as("o_orderkey"),
            lit(9.75).as("o_totalprice"), lit("Z").as("o_flag")))
        t.merge(batch, "o_orderkey", mergeSchema = true)           // v2
        t
      }) }

  def q101MergeEvolve(s: SparkSession, d: String): DataFrame =
    evolveMergeTable(s, d).read()

  private val partMerged = scala.collection.concurrent.TrieMap.empty[String, String]

  // q102: PARTITIONED-TABLE MERGE (round 16, late addition — the gap
  // a Delta user hits next after q99: MERGE INTO a hive-partitioned
  // table). Orders land partitioned by status; a conditional merge
  // re-prices every 6th key ONLY where the target row's status is
  // 'O' (a clause condition on the PARTITION column, restored from
  // the value dirs) and inserts one brand-new key with NO status —
  // which must land under the hive null-partition dir and serve back
  // as NULL. Chain pruning, chain-preserving restage, and the
  // null-dir round-trip all sit inside the hash: a merge that read
  // or restaged unmatched partitions' files is caught separately by
  // GraftMergeIntoSpec's byte-identity case.
  private def partMergeTable(s: SparkSession, d: String): String =
    partMerged.synchronized { partMerged.getOrElseUpdate(
      s.sparkContext.applicationId + "|" + d,
      graft.tools.BuildCosts.timed("build:q102_part_merge_lifecycle") {
        import graft.sources.MergeClauses._
        val dir = java.nio.file.Files
          .createTempDirectory("graft_partmerge").toString + "/t"
        val t = GraftTable.forPath(s, dir)
        val orders = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_totalprice"),
            col("o_orderstatus").as("ostatus"))
        t.appendPartitioned(orders, "ostatus")                     // v1
        val keyMax = orders.agg(max("o_orderkey")).head().getLong(0)
        val batch = orders
          .filter(pmod(col("o_orderkey"), lit(6L)) === 0)
          .select(col("o_orderkey"),
            (col("o_totalprice") * 2).as("o_totalprice"))
          .unionByName(s.range(1, 2).select(
            (lit(keyMax) + lit(7L)).as("o_orderkey"),
            lit(123.25).as("o_totalprice")))
        t.mergeInto(batch, Seq("o_orderkey"),
          matched = Seq(MatchedUpdate(Some(expr("t.ostatus = 'O'")),
            Map("o_totalprice" -> expr("s.o_totalprice")))),
          notMatched = Seq(NotMatchedInsert(None,
            Map("o_orderkey" -> expr("s.o_orderkey"),
              "o_totalprice" -> expr("s.o_totalprice")))))         // v2
        dir
      }) }

  def q102PartitionedMerge(s: SparkSession, d: String): DataFrame =
    s.read.format("graft").load(partMergeTable(s, d))

  private val condMerged = scala.collection.concurrent.TrieMap.empty[String, String]

  // q99: CONDITIONAL MULTI-CLAUSE MERGE — the full Delta clause
  // surface in ONE commit (round-16 verdict item 1; the reference's
  // approval flow — only PENDING rows may transition,
  // `ApprovalEditData` app.py:5336, `approve-tag-equipment`
  // app.py:5706 — is the motivating statement). Orders land flat and
  // range-staged; the batch re-prices every 5th key (×2 — INTEGER
  // factor, the decimal-tie rule) plus two brand-new keys; one
  // mergeInto then applies: matched 'P' rows DELETE, matched 'O' rows
  // take the new price, matched 'F' rows carry through (no clause),
  // unmatched-by-source cheap 'F' rows close out (DELETE), unmatched
  // 'P' rows expire (status 'X'), and the new keys INSERT with the
  // status column NULL-filled (Delta's rule for unspecified insert
  // columns). The serving read is the full post-merge table — a wrong
  // clause order, a mis-scoped condition, a dropped NULL-fill, or a
  // leaked out-of-clause rewrite cannot hash-match DuckDB replaying
  // the same CASE/anti-join algebra on `orders`.
  private def condMergeTable(s: SparkSession, d: String): String =
    condMerged.synchronized { condMerged.getOrElseUpdate(
      s.sparkContext.applicationId + "|" + d,
      graft.tools.BuildCosts.timed("build:q99_cond_merge_lifecycle") {
        import graft.sources.MergeClauses._
        val dir = java.nio.file.Files
          .createTempDirectory("graft_condmerge").toString + "/t"
        val orders = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice"))
        GraftTable.create(s, dir,
          orders.repartitionByRange(8, col("o_orderkey")))         // v1
        val keyMax = orders.agg(max("o_orderkey")).head().getLong(0)
        val batch = orders
          .filter(pmod(col("o_orderkey"), lit(5L)) === 0)
          .select(col("o_orderkey"),
            (col("o_totalprice") * 2).as("o_totalprice"))
          .unionByName(s.range(1, 3).select(
            (lit(keyMax) + col("id") * 11).as("o_orderkey"),
            (lit(55.25) + col("id")).as("o_totalprice")))
        GraftTable.forPath(s, dir).mergeInto(batch, Seq("o_orderkey"),
          matched = Seq(
            MatchedDelete(Some(expr("t.o_orderstatus = 'P'"))),
            MatchedUpdate(Some(expr("t.o_orderstatus = 'O'")),
              Map("o_totalprice" -> expr("s.o_totalprice")))),
          notMatched = Seq(NotMatchedInsert(None,
            Map("o_orderkey" -> expr("s.o_orderkey"),
              "o_totalprice" -> expr("s.o_totalprice")))),
          notMatchedBySource = Seq(
            BySourceDelete(Some(expr(
              "t.o_orderstatus = 'F' AND t.o_totalprice < 1000.0"))),
            BySourceUpdate(Some(expr("t.o_orderstatus = 'P'")),
              Map("o_orderstatus" -> lit("X")))))                  // v2
        dir
      }) }

  def q99ConditionalMerge(s: SparkSession, d: String): DataFrame =
    s.read.format("graft").load(condMergeTable(s, d))

  private val renamedMerged =
    scala.collection.concurrent.TrieMap.empty[String, String]

  // q103: RENAMED-KEY + NON-EQUI MERGE (round 17 — Delta's arbitrary
  // ON, the reference's renamed-upload shape: HeaderMapper exists
  // precisely because Excel batches arrive with different headers,
  // app.py:5999-6021). The SQL router splits `ON t.o_orderkey =
  // s.src_key AND t.o_totalprice < 5000.0` into the equi key
  // (renamed: src_key maps onto o_orderkey before the probe) and the
  // residual conjunct (folded into the match condition): a key-
  // matching row at price >= 5000 is NOT matched, so it keeps its
  // price AND the source row INSERTS alongside it — exactly the
  // Delta semantics a naive equi-only router gets wrong. The oracle
  // replays the same left-join/anti-join algebra in DuckDB; a router
  // that dropped the residual, mis-mapped the rename, or inserted
  // under the wrong column cannot hash-match.
  private def renamedMergeTable(s: SparkSession, d: String): String =
    renamedMerged.synchronized { renamedMerged.getOrElseUpdate(
      s.sparkContext.applicationId + "|" + d,
      graft.tools.BuildCosts.timed("build:q103_renamed_merge_lifecycle") {
        val dir = java.nio.file.Files
          .createTempDirectory("graft_renmerge").toString + "/t"
        val orders = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice"))
        GraftTable.create(s, dir,
          orders.repartitionByRange(8, col("o_orderkey")))         // v1
        orders.filter(pmod(col("o_orderkey"), lit(7L)) === 0)
          .select(col("o_orderkey").as("src_key"),
            (col("o_totalprice") * 2).as("src_price"))
          .createOrReplaceTempView("q103_batch")
        s.conf.set("spark.sql.catalog.gsql",
          classOf[graft.sources.GraftCatalog].getName)
        s.sql(s"MERGE INTO gsql.`$dir` t USING q103_batch s " +
          "ON t.o_orderkey = s.src_key AND t.o_totalprice < 5000.0 " +
          "WHEN MATCHED THEN UPDATE SET o_totalprice = s.src_price " +
          "WHEN NOT MATCHED THEN INSERT (o_orderkey, o_totalprice) " +
          "VALUES (s.src_key, s.src_price)")                       // v2
        dir
      }) }

  def q103RenamedMerge(s: SparkSession, d: String): DataFrame =
    s.read.format("graft").load(renamedMergeTable(s, d))

  private val fscked = scala.collection.concurrent.TrieMap.empty[String, GraftTable]

  // q92: FSCK — the out-of-band-loss repair lifecycle, oracled. The
  // loss is made DETERMINISTIC by partition layout: a hive-
  // partitioned landing puts every bucket=3 row in the bucket=3
  // value dirs, the "lifecycle policy" removes exactly those dirs
  // behind the log's back, and `GRAFT FSCK` drops the now-missing
  // references in one metadata commit. The serving read is then
  // EXACTLY the corpus minus bucket 3 — an oracle only the correct
  // sweep (every missing ref dropped, no live ref dropped, no
  // resurrection) can match.
  private def fsckTable(s: SparkSession, d: String): GraftTable =
    fscked.synchronized { fscked.getOrElseUpdate(s.sparkContext.applicationId + "|" + d, {
      val root = java.nio.file.Files
        .createTempDirectory("graft_fsck").toString + "/t"
      val t = GraftTable.forPath(s, root)
      t.appendPartitioned(Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"),
          pmod(col("o_orderkey"), lit(4L)).as("bucket")), "bucket") // v1
      // the out-of-band loss: every bucket=3 data dir vanishes
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      def sweep(f: java.io.File): Unit =
        if (f.isDirectory) {
          if (f.getName == "bucket=3") rm(f)
          else f.listFiles().foreach(sweep)
        }
      sweep(new java.io.File(root, "data"))
      s.sql(s"GRAFT FSCK '$root'")                                 // v2
      t
    }) }

  def q92FsckRead(s: SparkSession, d: String): DataFrame =
    fsckTable(s, d).read()
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double").as("total_price"),
        min("o_orderkey").as("first_key"))
      .orderBy("o_orderstatus")

  def q91ConvertRead(s: SparkSession, d: String): DataFrame =
    convertedTable(s, d).read()
      .filter(col("l_quantity") >= 25)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(18,2)"))
          .cast("double").as("sum_qty"),
        countDistinct(col("l_partkey")).as("n_parts"))
      .orderBy("l_returnflag")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q103_renamed_key_merge" -> (q103RenamedMerge _),
    "q102_partitioned_merge" -> (q102PartitionedMerge _),
    "q101_merge_evolve" -> (q101MergeEvolve _),
    "q100_replace_cdf" -> (q100ReplaceCdf _),
    "q99_conditional_merge" -> (q99ConditionalMerge _),
    "q98_scoped_zorder" -> (q98ScopedZorder _),
    "q97_backfill" -> (q97Backfill _),
    "q96_sql_partitioned" -> (q96SqlPartitioned _),
    "q95_multi_partition" -> (q95MultiPartition _),
    "q94_date_partition" -> (q94DatePartition _),
    "q93_string_partition" -> (q93StringPartition _),
    "q92_fsck_read" -> (q92FsckRead _),
    "q91_convert_read" -> (q91ConvertRead _),
    "q90_sql_maintenance" -> (q90SqlMaintenance _),
    "q89_shallow_clone" -> (q89ShallowClone _),
    "q86_sql_update" -> (q86SqlUpdate _),
    "q87_sql_merge" -> (q87SqlMerge _),
    "q84_delete_vectors" -> (q84DeleteVectors _),
    "q85_reorg_purge" -> (q85ReorgPurge _),
    "q83_update_where" -> (q83UpdateWhere _),
    "q82_skip_read" -> (q82SkipRead _),
    "q81_metadata_count" -> (q81MetadataCount _),
    "q74_time_travel" -> (q74TimeTravel _),
    "q75_table_history" -> (q75TableHistory _),
    "q76_change_feed" -> (q76ChangeFeed _),
    "q77_restore" -> (q77Restore _),
    "q78_merge_into" -> (q78MergeInto _),
    "q79_delete_where" -> (q79DeleteWhere _),
    "q80_cdf_merge" -> (q80CdfMerge _),
  )

  /** q84/q85 shared algebra: MoR delete then MoR update replayed as
    * plain SQL (the dv mechanics are invisible to the row semantics —
    * exactly the point).
    */
  private val morSql =
    """WITH surv AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      |  WHERE NOT (o_orderkey <= (SELECT max(o_orderkey) // 4 FROM orders)
      |             AND o_orderkey % 11 = 4))
      |SELECT o_orderkey,
      |  CASE WHEN o_orderkey <= (SELECT max(o_orderkey) // 2 FROM orders)
      |        AND o_orderkey % 13 = 6
      |    THEN 'M' ELSE o_orderstatus END AS o_orderstatus,
      |  CASE WHEN o_orderkey <= (SELECT max(o_orderkey) // 2 FROM orders)
      |        AND o_orderkey % 13 = 6
      |    THEN o_totalprice * 0.5 ELSE o_totalprice END AS o_totalprice
      |FROM surv ORDER BY o_orderkey""".stripMargin

  val oracles: Map[String, String] = Map(
    "q102_partitioned_merge" ->
      """WITH s AS (
        |  SELECT o_orderkey, o_totalprice * 2 AS p
        |  FROM orders WHERE o_orderkey % 6 = 0
        |  UNION ALL
        |  SELECT (SELECT max(o_orderkey) FROM orders) + 7, 123.25),
        |m AS (
        |  SELECT t.o_orderkey,
        |    CASE WHEN s.o_orderkey IS NOT NULL
        |      AND t.o_orderstatus = 'O' THEN s.p
        |      ELSE t.o_totalprice END AS o_totalprice,
        |    t.o_orderstatus AS ostatus
        |  FROM orders t LEFT JOIN s ON t.o_orderkey = s.o_orderkey
        |  UNION ALL
        |  SELECT s.o_orderkey, s.p, CAST(NULL AS VARCHAR)
        |  FROM s ANTI JOIN orders t USING (o_orderkey))
        |SELECT * FROM m ORDER BY o_orderkey""".stripMargin,
    "q101_merge_evolve" ->
      """WITH s AS (
        |  SELECT o_orderkey, o_totalprice * 2 AS p,
        |    o_orderstatus AS o_flag
        |  FROM orders WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT (SELECT max(o_orderkey) FROM orders) + 5, 9.75, 'Z'),
        |m AS (
        |  SELECT t.o_orderkey,
        |    COALESCE(s.p, t.o_totalprice) AS o_totalprice,
        |    s.o_flag AS o_flag
        |  FROM orders t LEFT JOIN s ON t.o_orderkey = s.o_orderkey
        |  UNION ALL
        |  SELECT s.o_orderkey, s.p, s.o_flag
        |  FROM s ANTI JOIN orders t USING (o_orderkey))
        |SELECT * FROM m ORDER BY o_orderkey""".stripMargin,
    "q100_replace_cdf" ->
      """WITH y97 AS (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE year(o_orderdate) = 1997),
        |images AS (
        |  SELECT 'delete' AS _change_type, o_orderkey, o_totalprice
        |  FROM y97
        |  UNION ALL
        |  SELECT 'insert', o_orderkey, o_totalprice * 3 FROM y97)
        |SELECT _change_type, count(*) AS n_rows,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_price,
        |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        |FROM images GROUP BY 1 ORDER BY 1""".stripMargin,
    "q103_renamed_key_merge" ->
      """WITH t AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |b AS (
        |  SELECT o_orderkey AS src_key, o_totalprice * 2 AS src_price
        |  FROM orders WHERE o_orderkey % 7 = 0),
        |j AS (
        |  SELECT t.o_orderkey, t.o_orderstatus, t.o_totalprice,
        |    b.src_price
        |  FROM t LEFT JOIN b
        |    ON t.o_orderkey = b.src_key AND t.o_totalprice < 5000.0),
        |surv AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN src_price IS NOT NULL THEN src_price
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM j),
        |ins AS (
        |  SELECT b.src_key AS o_orderkey,
        |    CAST(NULL AS VARCHAR) AS o_orderstatus,
        |    b.src_price AS o_totalprice
        |  FROM b WHERE NOT EXISTS (
        |    SELECT 1 FROM t WHERE t.o_orderkey = b.src_key
        |      AND t.o_totalprice < 5000.0))
        |SELECT * FROM surv UNION ALL SELECT * FROM ins
        |ORDER BY o_orderkey, o_totalprice""".stripMargin,
    "q99_conditional_merge" ->
      """WITH t AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |s AS (
        |  SELECT o_orderkey, o_totalprice * 2 AS sp
        |  FROM orders WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT (SELECT max(o_orderkey) FROM orders) + 11, 56.25
        |  UNION ALL
        |  SELECT (SELECT max(o_orderkey) FROM orders) + 22, 57.25),
        |j AS (
        |  SELECT t.o_orderkey, t.o_orderstatus, t.o_totalprice, s.sp,
        |    CASE
        |      WHEN s.o_orderkey IS NOT NULL
        |        AND t.o_orderstatus = 'P' THEN 'DEL'
        |      WHEN s.o_orderkey IS NOT NULL
        |        AND t.o_orderstatus = 'O' THEN 'UPD'
        |      WHEN s.o_orderkey IS NULL AND t.o_orderstatus = 'F'
        |        AND t.o_totalprice < 1000.0 THEN 'DEL'
        |      WHEN s.o_orderkey IS NULL
        |        AND t.o_orderstatus = 'P' THEN 'EXP'
        |      ELSE 'KEEP' END AS act
        |  FROM t LEFT JOIN s ON t.o_orderkey = s.o_orderkey),
        |surv AS (
        |  SELECT o_orderkey,
        |    CASE WHEN act = 'EXP' THEN 'X'
        |         ELSE o_orderstatus END AS o_orderstatus,
        |    CASE WHEN act = 'UPD' THEN sp
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM j WHERE act <> 'DEL'),
        |ins AS (
        |  SELECT s.o_orderkey, CAST(NULL AS VARCHAR) AS o_orderstatus,
        |    s.sp AS o_totalprice
        |  FROM s ANTI JOIN t USING (o_orderkey))
        |SELECT * FROM surv UNION ALL SELECT * FROM ins
        |ORDER BY o_orderkey""".stripMargin,
    "q98_scoped_zorder" ->
      """SELECT o_orderstatus AS ostatus, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_price,
        |  min(o_orderkey) AS first_key,
        |  count(DISTINCT o_custkey) AS n_cust
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q97_backfill" ->
      """SELECT CAST(date_trunc('year', o_orderdate) AS DATE) AS oyear,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(CASE
        |    WHEN year(o_orderdate) = 1996 THEN o_totalprice * 2
        |    WHEN year(o_orderdate) = 1997 THEN o_totalprice * 3
        |    ELSE o_totalprice END AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_price,
        |  min(o_orderkey) AS first_key
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q96_sql_partitioned" ->
      """SELECT o_orderstatus AS ostatus, count(*) AS n_orders,
        |  CAST(sum(CAST(CASE WHEN o_orderstatus = 'P'
        |    THEN o_totalprice * 2 ELSE o_totalprice END
        |    AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        |  min(o_orderkey) AS first_key
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q95_multi_partition" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_totalprice,
        |    o_orderstatus AS ostatus,
        |    CAST(date_trunc('year', o_orderdate) AS DATE) AS oyear
        |  FROM orders WHERE o_totalprice >= 1000),
        |shaped AS (
        |  SELECT 'by_status' AS probe, ostatus, oyear,
        |    count(*) AS n_orders,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS total_price,
        |    min(o_orderkey) AS first_key
        |  FROM base WHERE ostatus = 'F' GROUP BY 2, 3
        |  UNION ALL
        |  SELECT 'by_year' AS probe, ostatus, oyear,
        |    count(*) AS n_orders,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS total_price,
        |    min(o_orderkey) AS first_key
        |  FROM base WHERE year(oyear) IN (1996, 1997) GROUP BY 2, 3)
        |SELECT * FROM shaped ORDER BY probe, ostatus, oyear""".stripMargin,
    "q94_date_partition" ->
      """SELECT CAST(date_trunc('year', o_orderdate) AS DATE) AS oyear,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_price,
        |  min(o_orderkey) AS first_key
        |FROM orders
        |WHERE o_totalprice >= 1000
        |  AND year(o_orderdate) IN (1996, 1998, 2000)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q93_string_partition" ->
      """SELECT c_mktsegment, count(*) AS n_cust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_bal,
        |  min(c_custkey) AS first_key
        |FROM customer
        |WHERE c_acctbal >= 0
        |  AND c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q92_fsck_read" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_price,
        |  min(o_orderkey) AS first_key
        |FROM orders WHERE o_orderkey % 4 <> 3
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q91_convert_read" ->
      """SELECT l_returnflag, count(*) AS n_items,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_qty,
        |  count(DISTINCT l_partkey) AS n_parts
        |FROM lineitem
        |WHERE l_orderkey % 10 <> 3 AND l_quantity >= 25
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q84_delete_vectors" -> morSql,
    "q85_reorg_purge" -> morSql,
    "q74_time_travel" ->
      """SELECT o_orderstatus,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_price,
        |  min(o_orderdate) AS first_date,
        |  max(o_orderdate) AS last_date
        |FROM orders WHERE o_orderstatus IN ('F', 'O')
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q76_change_feed" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_price
        |FROM orders WHERE o_orderstatus = 'O'
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q77_restore" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_price
        |FROM orders WHERE o_orderstatus IN ('F', 'O')
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q90_sql_maintenance" ->
      """WITH np AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderstatus <> 'P'),
        |dev AS (SELECT * FROM np WHERE o_orderkey % 3 <> 0),
        |agg AS (
        |  SELECT 'source' AS side, o_orderstatus,
        |    count(*) AS n_orders,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS total_price
        |  FROM np GROUP BY o_orderstatus
        |  UNION ALL
        |  SELECT 'dev' AS side, o_orderstatus,
        |    count(*) AS n_orders,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS total_price
        |  FROM dev GROUP BY o_orderstatus)
        |SELECT * FROM agg ORDER BY side, o_orderstatus""".stripMargin,
    "q89_shallow_clone" ->
      """WITH fo AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderstatus IN ('F', 'O')),
        |cl AS (SELECT * FROM fo WHERE o_orderkey % 7 <> 0),
        |agg AS (
        |  SELECT 'source' AS side, o_orderstatus,
        |    count(*) AS n_orders,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS total_price
        |  FROM fo GROUP BY o_orderstatus
        |  UNION ALL
        |  SELECT 'clone' AS side, o_orderstatus,
        |    count(*) AS n_orders,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS total_price
        |  FROM cl GROUP BY o_orderstatus)
        |SELECT * FROM agg ORDER BY side, o_orderstatus""".stripMargin,
    "q86_sql_update" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey <= (SELECT max(o_orderkey) // 4 FROM orders)
        |        AND o_orderkey % 6 = 1
        |    THEN 'S' ELSE o_orderstatus END AS o_orderstatus,
        |  CASE WHEN o_orderkey <= (SELECT max(o_orderkey) // 4 FROM orders)
        |        AND o_orderkey % 6 = 1
        |    THEN o_totalprice * 1.25 ELSE o_totalprice END AS o_totalprice
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q87_sql_merge" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderstatus = 'O'),
        |upd AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice * 3 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 9 = 0)
        |SELECT COALESCE(u.o_orderkey, b.o_orderkey) AS o_orderkey,
        |  COALESCE(u.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
        |  COALESCE(u.o_totalprice, b.o_totalprice) AS o_totalprice
        |FROM base b FULL OUTER JOIN upd u ON b.o_orderkey = u.o_orderkey
        |ORDER BY o_orderkey""".stripMargin,
    "q83_update_where" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey <= (SELECT max(o_orderkey) // 4 FROM orders)
        |        AND o_orderkey % 5 = 0
        |    THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
        |  CASE WHEN o_orderkey <= (SELECT max(o_orderkey) // 4 FROM orders)
        |        AND o_orderkey % 5 = 0
        |    THEN o_totalprice * 1.5 ELSE o_totalprice END AS o_totalprice
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q82_skip_read" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderstatus = 'F'),
        |upd AS (
        |  SELECT o_orderkey, o_totalprice * 2 AS p
        |  FROM orders WHERE o_orderkey % 10 = 0),
        |merged AS (
        |  SELECT COALESCE(b.o_orderkey, u.o_orderkey) AS o_orderkey,
        |    b.o_orderstatus AS o_orderstatus,
        |    COALESCE(u.p, b.o_totalprice) AS o_totalprice
        |  FROM base b FULL OUTER JOIN upd u ON b.o_orderkey = u.o_orderkey),
        |final AS (
        |  SELECT * FROM merged
        |  WHERE NOT (o_orderkey <= (SELECT max(o_orderkey) // 4 FROM orders)
        |             AND o_orderkey % 7 = 3))
        |SELECT * FROM final
        |WHERE o_orderkey <= (SELECT max(o_orderkey) // 8 FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "q81_metadata_count" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderstatus = 'F'),
        |upd AS (
        |  SELECT o_orderkey, o_totalprice * 2 AS p
        |  FROM orders WHERE o_orderkey % 10 = 0),
        |merged AS (
        |  SELECT COALESCE(b.o_orderkey, u.o_orderkey) AS o_orderkey
        |  FROM base b FULL OUTER JOIN upd u ON b.o_orderkey = u.o_orderkey)
        |SELECT count(*) AS n_rows FROM merged
        |WHERE NOT (o_orderkey <= (SELECT max(o_orderkey) // 4 FROM orders)
        |           AND o_orderkey % 7 = 3)""".stripMargin,
    "q78_merge_into" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderstatus = 'F'),
        |upd AS (
        |  SELECT o_orderkey, o_totalprice * 2 AS p
        |  FROM orders WHERE o_orderkey % 10 = 0)
        |SELECT COALESCE(b.o_orderkey, u.o_orderkey) AS o_orderkey,
        |  b.o_orderstatus AS o_orderstatus,
        |  COALESCE(u.p, b.o_totalprice) AS o_totalprice
        |FROM base b FULL OUTER JOIN upd u ON b.o_orderkey = u.o_orderkey
        |ORDER BY o_orderkey""".stripMargin,
    "q79_delete_where" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderstatus = 'F'),
        |upd AS (
        |  SELECT o_orderkey, o_totalprice * 2 AS p
        |  FROM orders WHERE o_orderkey % 10 = 0),
        |merged AS (
        |  SELECT COALESCE(b.o_orderkey, u.o_orderkey) AS o_orderkey,
        |    b.o_orderstatus AS o_orderstatus,
        |    COALESCE(u.p, b.o_totalprice) AS o_totalprice
        |  FROM base b FULL OUTER JOIN upd u ON b.o_orderkey = u.o_orderkey)
        |SELECT * FROM merged
        |WHERE NOT (o_orderkey <= (SELECT max(o_orderkey) // 4 FROM orders)
        |           AND o_orderkey % 7 = 3)
        |ORDER BY o_orderkey""".stripMargin,
    "q80_cdf_merge" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderstatus = 'F'),
        |upd AS (
        |  SELECT o_orderkey, o_totalprice * 2 AS p
        |  FROM orders WHERE o_orderkey % 10 = 0),
        |merged AS (
        |  SELECT COALESCE(b.o_orderkey, u.o_orderkey) AS k,
        |    COALESCE(u.p, b.o_totalprice) AS price,
        |    b.o_orderkey IS NOT NULL AS in_base,
        |    u.o_orderkey IS NOT NULL AS in_upd
        |  FROM base b FULL OUTER JOIN upd u ON b.o_orderkey = u.o_orderkey),
        |images AS (
        |  SELECT 'insert' AS ct, k, price FROM merged WHERE NOT in_base
        |  UNION ALL
        |  SELECT 'update_preimage', b.o_orderkey, b.o_totalprice
        |  FROM base b JOIN upd u ON b.o_orderkey = u.o_orderkey
        |  UNION ALL
        |  SELECT 'update_postimage', k, price FROM merged
        |  WHERE in_base AND in_upd
        |  UNION ALL
        |  SELECT 'delete', k, price FROM merged
        |  WHERE k <= (SELECT max(o_orderkey) // 4 FROM orders)
        |    AND k % 7 = 3)
        |SELECT ct AS _change_type, count(*) AS n_rows,
        |  CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        |  min(k) AS min_key, max(k) AS max_key
        |FROM images GROUP BY ct ORDER BY ct""".stripMargin,
    "q75_table_history" ->
      """WITH c AS (
        |  SELECT count(*) FILTER (WHERE o_orderstatus = 'F') AS nf,
        |         count(*) FILTER (WHERE o_orderstatus = 'O') AS no,
        |         count(*) FILTER (WHERE o_orderstatus = 'P') AS np
        |  FROM orders)
        |SELECT v.version, v.action, v.n_rows FROM c, (VALUES
        |  (1, 'append',    (SELECT nf FROM c)),
        |  (2, 'append',    (SELECT nf + no FROM c)),
        |  (3, 'compact',   (SELECT nf + no FROM c)),
        |  (4, 'overwrite', (SELECT np FROM c))
        |) AS v(version, action, n_rows)
        |ORDER BY v.version""".stripMargin,
  )
}
