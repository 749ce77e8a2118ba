package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Graph-shaped export sink — the offline analog of the reference's
  * Neo4j materialization (`eni_uat_backend_code/app.py:2290-2687`,
  * which pushes the object-connection graph into a graph database).
  * With zero egress the honest equivalent is a nodes+edges parquet
  * dataset any graph loader (Neo4j admin import, GraphFrames, cuGraph)
  * can bulk-ingest:
  *
  *   out/nodes/comp_bucket=…/  (user_id, component)
  *   out/edges/comp_bucket=…/  (user_id, g, component)
  *
  * Edges are the BIPARTITE membership (user ↔ property-bucket), not
  * materialized user-user pairs: pair expansion is quadratic per
  * bucket and reconstructible from the bipartite form, so at 100 TB
  * the export ships the linear representation and lets the consumer
  * expand locally if it must.
  *
  * Both tables are directory-partitioned by `comp_bucket =
  * pmod(component, nBuckets)` — component ids are high-cardinality
  * (one per subgraph), so raw-id partitioning would create one
  * directory per component; the bounded bucket keeps the layout sane
  * while still letting a single-component read prune to one
  * directory's files.
  */
object GraphExport {

  /** @param membership bipartite edges (user_id, g) — g1's input graph
    * @param labels     node components (user_id, component) — g1's output
    */
  def writeGraph(membership: DataFrame, labels: DataFrame, outDir: String,
                 nBuckets: Int = 16): Unit = {
    val nodes = labels.select(col("user_id"), col("component"))
      .withColumn("comp_bucket", pmod(col("component"), lit(nBuckets)))
    val edges = membership.select(col("user_id"), col("g"))
      .join(labels.select(col("user_id"), col("component")), Seq("user_id"))
      .withColumn("comp_bucket", pmod(col("component"), lit(nBuckets)))
    nodes.write.mode(SaveMode.Overwrite)
      .partitionBy("comp_bucket").parquet(s"$outDir/nodes")
    edges.write.mode(SaveMode.Overwrite)
      .partitionBy("comp_bucket").parquet(s"$outDir/edges")
  }

  def readNodes(s: SparkSession, outDir: String): DataFrame =
    s.read.parquet(s"$outDir/nodes")

  def readEdges(s: SparkSession, outDir: String): DataFrame =
    s.read.parquet(s"$outDir/edges")
}
