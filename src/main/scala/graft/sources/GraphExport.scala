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

  /** The neo4j-admin BULK IMPORT layout (the cutover artifact for the
    * reference's live Neo4j push, `app.py:2290-2687` — `Object` nodes
    * with box/text properties, `CONNECTED_TO` relationships): one
    * single-line typed header file per entity plus HEADERLESS data
    * CSVs written distributed, exactly the split neo4j-admin
    * documents for parallel loaders:
    *
    *   out/nodes.header.csv                id:ID,…props…,:LABEL
    *   out/nodes/part-*.csv                data, no header
    *   out/relationships.header.csv        :START_ID,:END_ID,…,:TYPE
    *   out/relationships/part-*.csv        data, no header
    *
    *   neo4j-admin database import full \
    *     --nodes=out/nodes.header.csv,out/nodes/part-.*\.csv \
    *     --relationships=out/relationships.header.csv,out/relationships/part-.*\.csv
    *
    * Property columns carry neo4j type suffixes derived from the
    * Spark schema (`:long`, `:double`, …; strings are the default and
    * carry none). The header is written ONCE driver-side (a
    * Spark-written per-part header would repeat per file, which
    * neo4j-admin rejects); data files stay a distributed write — at
    * 100 TB the export is a plain map-only CSV job.
    */
  def writeNeo4jCsv(nodes: DataFrame, idCol: String, label: String,
                    edges: DataFrame, srcCol: String, dstCol: String,
                    relType: String, outDir: String): Unit = {
    def suffix(dt: org.apache.spark.sql.types.DataType): String = dt match {
      case org.apache.spark.sql.types.LongType => ":long"
      case org.apache.spark.sql.types.IntegerType => ":int"
      case org.apache.spark.sql.types.ShortType => ":short"
      case org.apache.spark.sql.types.DoubleType => ":double"
      case org.apache.spark.sql.types.FloatType => ":float"
      case org.apache.spark.sql.types.BooleanType => ":boolean"
      case _ => "" // string is neo4j's default property type
    }
    def writeHeader(path: String, line: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(
        nodes.sparkSession.sparkContext.hadoopConfiguration)
      val os = fs.create(p, true)
      os.write((line + "\n").getBytes("UTF-8")); os.close()
    }
    def writeCsv(df: DataFrame, dir: String): Unit =
      df.write.mode(SaveMode.Overwrite)
        .option("header", "false").option("emptyValue", "")
        .csv(dir)

    val nProps = nodes.schema.fields.filterNot(_.name == idCol)
    writeHeader(s"$outDir/nodes.header.csv",
      (s"$idCol:ID" +: nProps.map(f => f.name + suffix(f.dataType)))
        .mkString(",") + ",:LABEL")
    writeCsv(nodes.select((col(idCol) +: nProps.map(f => col(f.name)))
      :+ lit(label).as("__label"): _*), s"$outDir/nodes")

    val eProps = edges.schema.fields
      .filterNot(f => f.name == srcCol || f.name == dstCol)
    writeHeader(s"$outDir/relationships.header.csv",
      (Seq(":START_ID", ":END_ID") ++
        eProps.map(f => f.name + suffix(f.dataType)))
        .mkString(",") + ",:TYPE")
    writeCsv(edges.select((Seq(col(srcCol), col(dstCol)) ++
      eProps.map(f => col(f.name))) :+ lit(relType).as("__type"): _*),
      s"$outDir/relationships")
  }
}
