package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-typed loaders for the driver-generated tables (TESTDATA.md).
  *
  * All operators read through here so the scan is a plain parquet
  * relation Catalyst can push filters/projections into. No caching at
  * this layer: at 100 TB the tables don't fit, and re-reading a pruned
  * parquet scan is cheaper than spilling a cache.
  */
object Tables {
  private def p(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = p(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = p(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = p(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = p(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = p(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = p(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = p(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
    * read as a timestamp; read it as raw nanos (LongType) instead and
    * let operators derive seconds/micros exactly.
    *
    * CAVEAT: `nanosAsLong` is a SESSION conf (parquet converters offer
    * no per-read option), so this loader mutates shared session state
    * — after the first events() call, any OTHER nanos-timestamp
    * parquet in the session also reads as LongType instead of failing
    * loudly. Acceptable here because events is the only nanos table
    * and every graft session reads it; a multi-tenant session embedding
    * this library should set the conf at build time instead.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    p(s, d, "events")
  }
  def documents(s: SparkSession, d: String): DataFrame  = p(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = p(s, d, "embeddings")
}
