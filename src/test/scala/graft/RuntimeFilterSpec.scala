package graft

import org.apache.spark.sql.functions._

/** Runtime Bloom-filter join pruning — the modern semi-join pushdown
  * (Spark's runtime filters): when a fact⋈dim join has a selective
  * dim-side predicate, the optimizer can inject a Bloom filter built
  * from the dim keys and apply it to the FACT SCAN side, so fact rows
  * that cannot join die before the shuffle. At 100 TB this is the
  * difference between shuffling the whole fact table and shuffling
  * the matching fraction. The capability is conf-gated with size
  * thresholds tuned for real clusters; this spec lowers them to prove
  * the injection and the result-invariance on test data, and records
  * the recipe (SURVEY §2.9).
  */
class RuntimeFilterSpec extends SparkSpec {

  test("bloom runtime filter injects under a selective dim predicate; results invariant") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // AQE can replan the small join to broadcast before the filter
      // shows value on test data; keep the static plan for the assert
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    def query() = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).filter(col("p_size") < 5), // selective dim cut
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
      .orderBy("p_brand")
    val plain = query().collect()
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val df = query()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("bloom_filter") || plan.contains("BloomFilter"),
        s"no runtime bloom filter injected:\n$plan")
      // the filter must be applied on the FACT (lineitem) scan side
      assert(plan.contains("might_contain"),
        s"bloom probe missing from the application side:\n$plan")
      val filtered = df.collect()
      assert(filtered.sameElements(plain),
        "runtime filter changed the join result")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
