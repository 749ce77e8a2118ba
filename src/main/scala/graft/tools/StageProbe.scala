package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage timing for the d2 candidate machinery (scale triage). */
object StageProbe {
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
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val docs = graft.Tables.documents(spark, d)
      .withColumn("toks", expr("filter(split(text, ' '), x -> x != '')"))
      .filter(size(col("toks")) >= 3)
      .withColumn("shingles",
        graft.functions.GraftFunctions.shingle_hashes(col("toks"), 3))
      .withColumn("sz", size(col("shingles")).cast("long"))
    time("scan+tokenize+shingle")(docs.select("doc_id", "sz").count())
    val postings = docs
      .select(col("doc_id"), col("sz"), explode(col("shingles")).as("shh"))
    time("explode postings")(postings.count())
    time("groupBy(shh) count")(
      postings.groupBy("shh").agg(count(lit(1))).count())
    val collected = postings.groupBy("shh")
      .agg(graft.functions.GraftFunctions.capped_collect_pairs(
        col("doc_id"), col("sz"), 1000).as("members"))
      .filter(col("members").isNotNull)
    time("capped_collect groups")(collected.count())
    val pairs = collected
      .withColumn("a", explode(col("members")))
      .withColumn("b",
        explode(expr("filter(members, m -> m.doc_id > a.doc_id)")))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"),
        max(col("a.sz")).as("sa"), max(col("b.sz")).as("sb"))
    time("pair agg")(pairs.count())
    // prefix-filter plan stages
    val base = docs.withColumn("sorted", sort_array(col("shingles")))
      .select(col("doc_id"), col("sz"), col("sorted"))
    val pref = base
      .withColumn("plen", expr("cast(sz - (sz * 4 + 4) div 5 + 1 as int)"))
      .select(col("doc_id"), col("sz"),
        explode(expr("slice(sorted, 1, plen)")).as("shh"))
    time("prefix postings")(pref.count())
    val cands = pref.groupBy("shh")
      .agg(graft.functions.GraftFunctions.capped_collect_pairs(
        col("doc_id"), col("sz"), 1000).as("members"))
      .filter(col("members").isNotNull)
      .withColumn("a", explode(col("members")))
      .withColumn("b", explode(expr(
        "filter(members, m -> m.doc_id > a.doc_id " +
          "AND m.sz * 5 >= a.sz * 4 AND a.sz * 5 >= m.sz * 4)")))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    time("prefix cands distinct")(cands.count())
    val ver = cands
      .join(base.select(col("doc_id").as("doc_a"),
        col("sorted").as("sha"), col("sz").as("sa")), "doc_a")
      .join(base.select(col("doc_id").as("doc_b"),
        col("sorted").as("shb"), col("sz").as("sb")), "doc_b")
      .withColumn("shared",
        size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .filter(col("shared").cast("double") /
        (col("sa") + col("sb") - col("shared")) >= 0.8)
    time("verify joins")(ver.count())
    time("full d2")(graft.operators.TextOps
      .d2NgramJaccard(spark, d).count())
    spark.stop()
  }
}
