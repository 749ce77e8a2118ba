package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic N× scale-up of a testdata dir, for bench linearity
  * runs only (never correctness — the DuckDB oracles run on the
  * driver's own SFs). `sbt "runMain graft.tools.ScaleData <src> <out>
  * <n>"` writes an n×-sized copy of the sf tables such that every
  * headline query's WORKLOAD grows linearly, the property the bench
  * is probing:
  *
  *   - fact-side tables (customer/orders/lineitem/events/documents/
  *     embeddings) are replicated n times with all join/group keys
  *     shifted by replica·10⁹ — replicas join within themselves, key
  *     cardinality grows with the data (a same-key pileup would turn
  *     joins/aggs quadratic by construction, saying nothing about the
  *     plans);
  *   - dimensions (region/nation/part/supplier) stay 1× — dims don't
  *     grow 10× when a lake grows 10×, and g2's box side derives from
  *     part, so fact-side growth alone keeps its grid-join output
  *     linear instead of densifying the synthetic plane quadratically;
  *   - document text goes through a per-replica substitution CIPHER
  *     (a seeded shuffle of the alphabet, replica 0 = identity; the
  *     round-7 runs used a Caesar rotation, whose period of 26 would
  *     make replicas 0/26/52/78 of a 100× run share one token space —
  *     a ~4× cross-replica df pileup that measures the DATA, not the
  *     plan): each replica is structurally ISOMORPHIC to sf0.1 (same
  *     token counts, same shingle dfs, same duplicate relations — the
  *     transform is a letter bijection applied uniformly) while
  *     token/shingle spaces stay disjoint across replicas (two seeded
  *     permutations mapping a whole word to the same image requires
  *     agreeing on every letter of it — vanishing for real words), so
  *     dedup postings and LSH buckets grow linearly, never as
  *     cross-replica pileups of identical shingles;
  *   - embedding vectors get a per-replica ISOMETRY (circular shift
  *     of the 64 dimensions by replica, sign-flipped past replica 63;
  *     128 distinct maps ≥ any n used here). Round-7's exact clones
  *     were fine at 10× but at 100× would stack 100 identical vectors
  *     in every LSH/IVF bucket — an N² bucket pileup that no adaptive
  *     width can split, because the collision is exact, not random.
  *     An isometry preserves all within-replica distances (the
  *     workload's structure) while cross-replica vectors decorrelate.
  *
  * events.ts reads through Tables.events' encoding normalization and
  * re-lands as plain int64 nanos — exactly what every events operator
  * consumes.
  *
  * PINNED LAYOUT (round 15, verdict item 5): cross-round sf1 bench
  * comparisons were layout-confounded because a regenerated scale dir
  * carried whatever file counts and intra-file row order the union
  * write happened to produce (input splits vary; RangePartitioner's
  * sample seed varies by RDD id). Every fact table now lands through
  * an EXPLICIT hash repartition on its unique key (murmur3 — fixed
  * across runs) with a total in-partition sort, and dims land as one
  * sorted file — so two generations of the same source are
  * file-for-file identical in (row count, byte size). The generation
  * writes `MANIFEST.tsv` (table, n_files, n_rows, sorted per-file
  * (rows, bytes) list) next to the tables; SCALE docs compare
  * manifests to declare a cross-round capture comparable or not.
  */
object ScaleData {
  private val Off = 1000000000L
  private val Lower = "abcdefghijklmnopqrstuvwxyz"
  private val Upper = Lower.toUpperCase

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleData <srcDir> <outDir> <n>")
    val (src, out, n) = (args(0), args(1), args(2).toInt)
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame =
      if (t == "events") graft.Tables.events(spark, src)
      else spark.read.parquet(s"$src/$t.parquet")
    // the pinned layout: fact tables hash-repartition on their unique
    // sort key (deterministic murmur3 assignment) and sort within
    // partitions (deterministic bytes); dims and events land as one
    // sorted file. ~8 files per replica keeps per-file sizes in the
    // source's own range at any n.
    val sortKeys = Map(
      "region" -> Seq("r_regionkey"), "nation" -> Seq("n_nationkey"),
      "part" -> Seq("p_partkey"), "supplier" -> Seq("s_suppkey"),
      "customer" -> Seq("c_custkey"), "orders" -> Seq("o_orderkey"),
      "lineitem" -> Seq("l_orderkey", "l_linenumber"),
      "events" -> Seq("event_id"), "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"))
    // events must land as a single FILE named events.parquet — the
    // streaming readers select it with pathGlobFilter=events.parquet,
    // which never matches part-files inside a directory of that name
    def write(df0: DataFrame, t: String): Unit = {
      val keys = sortKeys(t).map(col)
      if (t == "events") {
        val stage = s"$out/.events_stage"
        df0.coalesce(1).sortWithinPartitions(keys: _*)
          .write.mode("overwrite").parquet(stage)
        val dir = new java.io.File(stage)
        val part = dir.listFiles.find(_.getName.endsWith(".parquet"))
          .getOrElse(sys.error(s"no part file in $stage"))
        val dest = java.nio.file.Paths.get(s"$out/events.parquet")
        java.nio.file.Files.deleteIfExists(dest)
        java.nio.file.Files.move(part.toPath, dest)
        dir.listFiles.foreach(_.delete()); dir.delete()
      } else {
        val dim = Seq("region", "nation", "part", "supplier").contains(t)
        val df = if (dim) df0.coalesce(1).sortWithinPartitions(keys: _*)
          else df0.repartition(8 * n, keys.head)
            .sortWithinPartitions(keys: _*)
        df.write.mode("overwrite").parquet(s"$out/$t.parquet")
      }
    }
    def rep(t: String)(shift: (DataFrame, Int) => DataFrame): Unit =
      write((0 until n).map(i => shift(read(t), i)).reduce(_ unionByName _), t)
    def shiftKeys(df: DataFrame, i: Int, keys: String*): DataFrame =
      keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(i * Off)))
    // seeded alphabet permutation, replica 0 = identity (uppercase
    // follows the same letter map so case-insensitive relations hold)
    def perm(i: Int): String =
      if (i == 0) Lower
      else new scala.util.Random(i * 2654435761L).shuffle(Lower.toList).mkString

    Seq("region", "nation", "part", "supplier")
      .foreach(t => write(read(t), t))
    rep("customer")((df, i) => shiftKeys(df, i, "c_custkey"))
    rep("orders")((df, i) => shiftKeys(df, i, "o_orderkey", "o_custkey"))
    // l_partkey/l_suppkey stay — they reference the 1× dims
    rep("lineitem")((df, i) => shiftKeys(df, i, "l_orderkey"))
    rep("events")((df, i) => shiftKeys(df, i, "event_id", "user_id"))
    rep("documents") { (df, i) =>
      val p = perm(i)
      shiftKeys(df, i, "doc_id")
        .withColumn("text",
          translate(col("text"), Lower + Upper, p + p.toUpperCase))
    }
    rep("embeddings") { (df, i) =>
      val dim = 64
      val shift = i % dim
      val sign = if ((i / dim) % 2 == 1) -1.0 else 1.0
      shiftKeys(df, i, "vec_id").withColumn("embedding", expr(
        s"transform(sequence(0, ${dim - 1}), j -> cast($sign * " +
          s"element_at(embedding, 1 + (j + $shift) % $dim) as float))"))
    }
    // the layout manifest: per table, file count + total rows + the
    // sorted per-file (rows, bytes) list — two generations of the
    // same source must produce byte-identical MANIFEST.tsv, the
    // comparability witness cross-round SCALE docs cite
    val manifest = new java.io.PrintWriter(s"$out/MANIFEST.tsv")
    try {
      sortKeys.keys.toSeq.sorted.foreach { t =>
        val files =
          if (t == "events") Seq(new java.io.File(s"$out/events.parquet"))
          else new java.io.File(s"$out/$t.parquet").listFiles.toSeq
            .filter(_.getName.endsWith(".parquet"))
        val perFile = files.map { f =>
          val rows = spark.read.parquet(f.getPath).count() // footer-only
          (rows, f.length())
        }.sorted
        manifest.println(s"$t\t${perFile.size}\t${perFile.map(_._1).sum}\t" +
          perFile.map(p => s"${p._1}:${p._2}").mkString(","))
      }
    } finally manifest.close()
    spark.stop()
  }
}
