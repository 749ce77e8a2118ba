package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._

/** SparkSessionExtensions entry point: makes the graft expression
  * library available to pure-SQL users via
  * `spark.sql.extensions=graft.GraftExtensions` — no Scala imports
  * needed on the cluster, matching how third-party Spark libraries
  * ship SQL surface.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("rolling_hash"),
      info("rolling_hash", "rolling_hash(str) - polynomial content fingerprint"),
      (es: Seq[Expression]) => RollingHash(es.head)))
    e.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine of two float arrays"),
      (es: Seq[Expression]) => CosineSim(es.head, es(1))))
    e.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash"),
      (es: Seq[Expression]) => SimHash64(es.head)))
    e.injectFunction((FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes", "shingle_hashes(tokens) - distinct 3-gram hashes"),
      (es: Seq[Expression]) => ShingleHashes(es.head, 3)))
    e.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(shingle_hashes) - 64-perm MinHash"),
      (es: Seq[Expression]) => MinHashSigLong(es.head, 64)))
    // aggregates (an AggregateExpression is an Expression)
    e.injectFunction((FunctionIdentifier("kmv_distinct"),
      info("kmv_distinct", "kmv_distinct(col) - KMV distinct-count sketch (k=256)"),
      (es: Seq[Expression]) =>
        KmvDistinct(es.head, 256).toAggregateExpression(isDistinct = false)))
    e.injectFunction((FunctionIdentifier("topk_by_score"),
      info("topk_by_score", "topk_by_score(score, id) - top-5 (score,id) pairs per group"),
      (es: Seq[Expression]) =>
        TopKByScore(es.head, es(1), 5).toAggregateExpression(isDistinct = false)))
  }
}
