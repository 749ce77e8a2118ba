package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 scale triage: stage timings for the reworked d2 prefix
  * plan (full-df pre-pass + positional filter) and the plain vs
  * bucketed co-purchase builders, at the 100× probe. Throwaway-style
  * (StageProbe's convention) — numbers land in docs/SCALE_r13.md.
  */
object Probe13 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/scale_x100")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    // --- d2 prefix-plan stages -----------------------------------
    val docs = graft.Tables.documents(spark, d)
      .withColumn("toks", expr("filter(split(text, ' '), x -> x != '')"))
      .filter(size(col("toks")) >= 3)
      .withColumn("shingles",
        graft.functions.GraftFunctions.shingle_hashes(col("toks"), 3))
      .withColumn("sz", size(col("shingles")).cast("long"))
    val base = docs.withColumn("sorted", sort_array(col("shingles")))
      .select(col("doc_id"), col("sz"), col("sorted"))
      .localCheckpoint()
    time("d2 base localCheckpoint")(base.count())
    time("d2 full-df pre-pass")(
      base.select(explode(col("sorted")).as("shh"))
        .groupBy("shh").agg(count(lit(1)).as("df"))
        .filter(col("df") > 1000).count())
    val withSzc = base.withColumn("szc", size(col("sorted")).cast("long"))
    val pref = withSzc
      .withColumn("plen", expr("cast(szc - (szc * 4 + 4) div 5 + 1 as int)"))
      .select(col("doc_id"), col("szc"),
        posexplode(expr("slice(sorted, 1, plen)")).as(Seq("pos", "shh")))
    val members = pref.groupBy("shh")
      .agg(graft.functions.GraftFunctions.capped_collect_pos(
        col("doc_id"), col("szc"), col("pos").cast("long"), 1000)
        .as("members"))
      .filter(col("members").isNotNull)
    val candsNoPos = members
      .withColumn("a", explode(col("members")))
      .withColumn("b", explode(expr(
        "filter(members, m -> m.doc_id > a.doc_id " +
          "AND m.sz * 5 >= a.sz * 4 AND a.sz * 5 >= m.sz * 4)")))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    time("d2 cands WITHOUT positional")(candsNoPos.count())
    time("d2 cands WITHOUT pos DISTINCT")(candsNoPos.distinct().count())
    val candsPos = members
      .withColumn("a", explode(col("members")))
      .withColumn("b", explode(expr(
        "filter(members, m -> m.doc_id > a.doc_id " +
          "AND m.sz * 5 >= a.sz * 4 AND a.sz * 5 >= m.sz * 4 " +
          "AND least(a.pos, m.pos) + 1 + " +
          "    least(a.sz - a.pos - 1, m.sz - m.pos - 1) >= " +
          "    (4 * (a.sz + m.sz) + 8) div 9)")))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    time("d2 cands WITH positional")(candsPos.count())
    val dist = candsPos.distinct().localCheckpoint()
    time("d2 cands WITH pos DISTINCT")(dist.count())
    val verified = dist
      .join(base.select(col("doc_id").as("doc_a"),
        col("sorted").as("sha"), col("sz").as("sa")), "doc_a")
      .join(base.select(col("doc_id").as("doc_b"),
        col("sorted").as("shb"), col("sz").as("sb")), "doc_b")
      .withColumn("shared",
        size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .withColumn("jaccard",
        col("shared").cast("double") / (col("sa") + col("sb") - col("shared")))
      .filter(col("jaccard") >= 0.8)
    time("d2 verification join")(verified.count())
    val verifiedShj = dist
      .join(base.select(col("doc_id").as("doc_a"),
        col("sorted").as("sha"), col("sz").as("sa")).hint("shuffle_hash"),
        "doc_a")
      .join(base.select(col("doc_id").as("doc_b"),
        col("sorted").as("shb"), col("sz").as("sb")).hint("shuffle_hash"),
        "doc_b")
      .withColumn("shared",
        size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .withColumn("jaccard",
        col("shared").cast("double") / (col("sa") + col("sb") - col("shared")))
      .filter(col("jaccard") >= 0.8)
    time("d2 verification join SHJ")(verifiedShj.count())
    time("d2 verification join SHJ(2)")(verifiedShj.count())
    val verifiedBc = dist
      .join(broadcast(base.select(col("doc_id").as("doc_a"),
        col("sorted").as("sha"), col("sz").as("sa"))), "doc_a")
      .join(broadcast(base.select(col("doc_id").as("doc_b"),
        col("sorted").as("shb"), col("sz").as("sb"))), "doc_b")
      .withColumn("shared",
        size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .withColumn("jaccard",
        col("shared").cast("double") / (col("sa") + col("sb") - col("shared")))
      .filter(col("jaccard") >= 0.8)
    time("d2 verification join BROADCAST")(verifiedBc.count())
    time("d2 verification join BROADCAST(2)")(verifiedBc.count())
    // --- co-purchase builders ------------------------------------
    val li = graft.Tables.lineitem(spark, d)
      .select("l_orderkey", "l_partkey")
    def pairsFrom(src: org.apache.spark.sql.DataFrame): Long =
      src.groupBy("l_orderkey")
        .agg(collect_set(col("l_partkey")).as("ps"))
        .withColumn("a", explode(col("ps")))
        .withColumn("b", explode(expr("filter(ps, p -> p > a)")))
        .groupBy("a", "b").agg(count(lit(1)).as("sup"))
        .filter(col("sup") >= 2).count()
    time("copurchase PLAIN build")(pairsFrom(li))
    val t0 = System.nanoTime()
    val bl = graft.operators.Events.bucketedLineitem(spark, d)
    println(f"[probe] bucketed LANDING                 ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    time("copurchase BUCKETED build")(pairsFrom(bl))
    time("copurchase BUCKETED build(2)")(pairsFrom(bl))
    // the downstream wedge cost shared by both (g15's scorer)
    time("g15 full (plain)")(
      graft.operators.Events.g15LinkPredict(spark, d).count())
    time("g15b full (bucketed)")(
      graft.operators.Events.g15LinkPredictBucketed(spark, d).count())
    spark.stop()
  }
}
