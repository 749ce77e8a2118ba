package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.GraftFunctions

/** The composed training-data pipeline (SURVEY.md §2.3/§2.5 put
  * together): exact-dedup → quality gate → fingerprint — the
  * clean-corpus pass an LLM data pipeline runs before tokenization.
  * One query end-to-end so the whole chain is oracle-checked; each
  * stage is also available standalone (d1/d3/d5).
  *
  * Scale shape: dedup is one shuffle on the content key, the quality
  * gate is a pure map, the fingerprint a codegen'd expression — the
  * pipeline adds nothing beyond d1's shuffle.
  */
object Pipeline {

  /** Survivors of exact dedup: the min doc_id per text value, keyed by
    * xxhash64(text) like d1 so no corpus-wide exchange carries (or is
    * keyed on) document text. Unique-hash docs — at a realistic dup
    * rate, almost all of the corpus — pass through with ZERO shuffle
    * (anti join against the small duplicated-hash set, broadcast by
    * AQE); only duplicate-hash docs co-locate by h for the full-text
    * survivor pick. A hash collision lands both texts in the resolve
    * branch where the per-text first-row filter keeps one survivor
    * per DISTINCT text — exact, as the collision-forcing spec proves.
    */
  def dedupKeepFirst(docs: DataFrame): DataFrame =
    dedupKeepFirstHashed(docs, xxhash64(col("text")))

  private[graft] def dedupKeepFirstHashed(
      docs: DataFrame, hash: org.apache.spark.sql.Column): DataFrame = {
    val withH = docs.withColumn("h", hash)
    val dupH = withH.select(col("h"), col("doc_id"))
      .groupBy("h").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).select("h")
    val uniques = withH.join(dupH, Seq("h"), "left_anti")
    // within the h-partition, rows sorted by (text, doc_id): the first
    // row of each distinct-text run is the min-doc_id survivor
    val w = Window.partitionBy("h").orderBy("text", "doc_id")
    val dupWinners = withH.join(dupH, Seq("h"), "left_semi")
      .withColumn("prev_text", lag("text", 1).over(w))
      .filter(col("prev_text").isNull || col("prev_text") =!= col("text"))
      .drop("prev_text")
    uniques.unionByName(dupWinners).drop("h")
  }

  /** Token/quality annotation (same formula as d3). */
  def annotate(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", expr("filter(split(text, ' '), x -> x != '')"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("stop_ratio",
        expr("cast(size(filter(toks, x -> x IN ('the', 'a', 'data', 'row'))) as bigint)")
          .cast("double") / col("n_tokens"))
      .withColumn("quality",
        (when(col("n_tokens").between(12, 80), 1).otherwise(0) +
         when(col("stop_ratio") < 0.3, 1).otherwise(0) +
         when(col("n_chars") >= 200, 1).otherwise(0)).cast("long"))

  // p1: the full pass — dedup, keep quality >= 2, fingerprint.
  def p1CleanCorpus(s: SparkSession, d: String): DataFrame =
    annotate(dedupKeepFirst(Tables.documents(s, d)))
      .filter(col("quality") >= 2)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("quality"),
              GraftFunctions.rolling_hash(col("text")).as("fingerprint"))
      .orderBy("doc_id")

  // p2: the fuller pretrain-data pass — dedup, language gate (d4's
  // marker heuristic), quality gate, BPE-ish token budget (d9's
  // counter; drops fragments and over-long docs), fingerprint. Every
  // stage after the single dedup shuffle is a pure map, so the whole
  // pipeline costs one shuffle end-to-end.
  def p2PretrainCorpus(s: SparkSession, d: String): DataFrame =
    annotate(dedupKeepFirst(Tables.documents(s, d)))
      .withColumn("n_en",
        expr("cast(size(filter(toks, x -> x IN ('the', 'a'))) as bigint)"))
      .filter(col("n_en") >= 2) // predicted 'en' (d4)
      .filter(col("quality") >= 2)
      .withColumn("bpe_tokens", expr(
        "aggregate(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0), " +
          "0L, (acc, m) -> acc + (length(m) + 3) div 4)"))
      .filter(col("bpe_tokens").between(20, 90)) // token budget
      .select(col("doc_id"), col("n_tokens"), col("bpe_tokens"), col("quality"),
              GraftFunctions.rolling_hash(col("text")).as("fingerprint"))
      .orderBy("doc_id")

  // p3: near-dup REMOVAL end-to-end — the fuzzy-dedup pass (pairs →
  // clusters → keep the canonical min-doc_id member) applied to the
  // corpus: d18's cluster labels decide, non-canonical members drop
  // via an anti join (broadcastable: the drop set is |near-dup docs| -
  // |clusters|, tiny relative to the corpus). p1/p2 remove EXACT
  // dups; this removes the near-dups they can't see.
  def p3NeardupCorpus(s: SparkSession, d: String): DataFrame = {
    val drop = TextOps.d18DupClusters(s, d)
      .filter(col("doc_id") =!= col("cluster")).select("doc_id")
    Tables.documents(s, d)
      .join(drop, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy("doc_id")
  }

  // p4: the INCREMENTAL corpus pass — what p1 looks like once the
  // corpus already exists and only a new batch arrives: d28's
  // incremental dedup admits genuinely-new texts (O(batch): the base
  // is probed through its hash index, never re-shuffled), then the
  // quality gate and fingerprint run map-only on the admitted
  // survivors. The semi join back to the batch is doc_id-keyed
  // (16-byte rows; the survivor id set is ≤ the batch). This is the
  // daily-crawl shape: p1 is the one-time backfill, p4 is every day
  // after.
  def p4IncrementalCorpus(s: SparkSession, d: String): DataFrame = {
    val nw = Tables.documents(s, d).filter(col("source") === "src19")
    val surv = TextOps.d28IncrementalDedupQ(s, d).select("doc_id")
    annotate(nw.join(surv, Seq("doc_id"), "left_semi"))
      .filter(col("quality") >= 2)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("quality"),
              GraftFunctions.rolling_hash(col("text")).as("fingerprint"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p1_clean_corpus" -> (p1CleanCorpus _),
    "p2_pretrain_corpus" -> (p2PretrainCorpus _),
    "p3_neardup_corpus" -> (p3NeardupCorpus _),
    "p4_incremental_corpus" -> (p4IncrementalCorpus _),
  )

  val oracles: Map[String, String] = Map(
    "p3_neardup_corpus" ->
      s"""WITH RECURSIVE ${TextOps.D2PairsCte},
         |cl AS (
         |  SELECT x AS doc_id, LEAST(x, MIN(y)) AS cluster
         |  FROM reach GROUP BY x)
         |SELECT doc_id, lang, source FROM documents
         |WHERE doc_id NOT IN (SELECT doc_id FROM cl WHERE doc_id <> cluster)
         |ORDER BY doc_id""".stripMargin,
    "p2_pretrain_corpus" ->
      """WITH kept AS (
        |  SELECT * FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |    FROM documents) t WHERE rn = 1),
        |ann AS (
        |  SELECT doc_id, text, n_chars,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x != ''))
        |         AS BIGINT) AS n_tokens,
        |    CAST(len(list_filter(list_filter(string_split(text, ' '),
        |           x -> x != ''), x -> x IN ('the', 'a', 'data', 'row')))
        |         AS BIGINT) AS n_stop,
        |    CAST(len(list_filter(list_filter(string_split(text, ' '),
        |           x -> x != ''), x -> x IN ('the', 'a')))
        |         AS BIGINT) AS n_en,
        |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'),
        |                     m -> CAST((length(m) + 3) // 4 AS BIGINT))),
        |      (a, b) -> a + b) AS BIGINT) AS bpe_tokens
        |  FROM kept),
        |scored AS (
        |  SELECT doc_id, text, n_tokens, n_en, bpe_tokens,
        |    CAST((CASE WHEN n_tokens BETWEEN 12 AND 80 THEN 1 ELSE 0 END) +
        |         (CASE WHEN CAST(n_stop AS DOUBLE) / n_tokens < 0.3
        |               THEN 1 ELSE 0 END) +
        |         (CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS quality
        |  FROM ann)
        |SELECT doc_id, n_tokens, bpe_tokens, quality,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(1, length(text) + 1),
        |                     i -> CAST(unicode(text[i]) AS BIGINT))),
        |    (h, c) -> (h * 31 + c) % 1000000007) AS fingerprint
        |FROM scored
        |WHERE n_en >= 2 AND quality >= 2 AND bpe_tokens BETWEEN 20 AND 90
        |ORDER BY doc_id""".stripMargin,
    "p4_incremental_corpus" ->
      """WITH nw AS (
        |  SELECT * FROM documents WHERE source = 'src19'),
        |surv AS (
        |  SELECT MIN(doc_id) AS doc_id FROM nw
        |  WHERE text NOT IN (SELECT text FROM documents WHERE source <> 'src19')
        |  GROUP BY text),
        |ann AS (
        |  SELECT n.doc_id, n.lang, n.text, n.n_chars,
        |    CAST(len(list_filter(string_split(n.text, ' '), x -> x != ''))
        |         AS BIGINT) AS n_tokens,
        |    CAST(len(list_filter(list_filter(string_split(n.text, ' '),
        |           x -> x != ''), x -> x IN ('the', 'a', 'data', 'row')))
        |         AS BIGINT) AS n_stop
        |  FROM nw n JOIN surv USING (doc_id)),
        |scored AS (
        |  SELECT doc_id, lang, text, n_tokens,
        |    CAST((CASE WHEN n_tokens BETWEEN 12 AND 80 THEN 1 ELSE 0 END) +
        |         (CASE WHEN CAST(n_stop AS DOUBLE) / n_tokens < 0.3
        |               THEN 1 ELSE 0 END) +
        |         (CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS quality
        |  FROM ann)
        |SELECT doc_id, lang, n_tokens, quality,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(1, length(text) + 1),
        |                     i -> CAST(unicode(text[i]) AS BIGINT))),
        |    (h, c) -> (h * 31 + c) % 1000000007) AS fingerprint
        |FROM scored WHERE quality >= 2 ORDER BY doc_id""".stripMargin,
    "p1_clean_corpus" ->
      """WITH kept AS (
        |  SELECT * FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |    FROM documents) t WHERE rn = 1),
        |ann AS (
        |  SELECT doc_id, lang, text, n_chars,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x != ''))
        |         AS BIGINT) AS n_tokens,
        |    CAST(len(list_filter(list_filter(string_split(text, ' '),
        |           x -> x != ''), x -> x IN ('the', 'a', 'data', 'row')))
        |         AS BIGINT) AS n_stop
        |  FROM kept),
        |scored AS (
        |  SELECT doc_id, lang, text, n_tokens,
        |    CAST((CASE WHEN n_tokens BETWEEN 12 AND 80 THEN 1 ELSE 0 END) +
        |         (CASE WHEN CAST(n_stop AS DOUBLE) / n_tokens < 0.3
        |               THEN 1 ELSE 0 END) +
        |         (CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS quality
        |  FROM ann)
        |SELECT doc_id, lang, n_tokens, quality,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(1, length(text) + 1),
        |                     i -> CAST(unicode(text[i]) AS BIGINT))),
        |    (h, c) -> (h * 31 + c) % 1000000007) AS fingerprint
        |FROM scored WHERE quality >= 2 ORDER BY doc_id""".stripMargin,
  )
}
