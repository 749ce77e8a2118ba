package graft

import org.apache.spark.sql.functions._
import graft.operators.Events
import graft.sources.GraphExport

class GraphExportSpec extends SparkSpec {

  test("graph export round-trips nodes+edges and partition-prunes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_graph").toString
    val membership = Events.membership(spark, sf).cache()
    val labels = Events.g1ConnectedComponents(membership) // (user_id, component)
    GraphExport.writeGraph(membership, labels, dir, nBuckets = 4)

    val nodes = GraphExport.readNodes(spark, dir)
    val edges = GraphExport.readEdges(spark, dir)
    // every graph node exported exactly once, every edge exactly once
    assert(nodes.count() == labels.count())
    assert(edges.count() == membership.count())
    // edges carry their endpoint's component
    val mismatched = edges.join(nodes.withColumnRenamed("comp_bucket", "nb"),
        Seq("user_id", "component"), "left_anti").count()
    assert(mismatched == 0, s"$mismatched edges with unknown (user, component)")
    // a one-bucket read prunes to that bucket's directory
    val one = nodes.filter(col("comp_bucket") === 1)
    val scanned = one.queryExecution.executedPlan.toString
    assert(scanned.contains("PartitionFilters") &&
           scanned.contains("comp_bucket"), s"no partition pruning:\n$scanned")
    assert(one.count() ==
      nodes.collect().count(_.getAs[Int]("comp_bucket") == 1))
    membership.unpersist()
  }

  test("neo4j-admin CSV export: typed headers, headerless parts, lossless readback") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_neo4j").toString
    // the reference's Object/CONNECTED_TO payload shape
    // (app.py:2290-2687): id, label, text_associated, bbox coords,
    // document_id on nodes; line_id on the relationship
    val nodes = Tables.part(spark, sf).limit(50)
      .select(col("p_partkey").as("id"),
        col("p_name").as("text_associated"),
        (col("p_partkey") % 100).cast("double").as("topX"),
        (col("p_partkey") % 80).cast("double").as("topY"),
        (col("p_partkey") % 100 + 10).cast("double").as("bottomX"),
        (col("p_partkey") % 80 + 10).cast("double").as("bottomY"),
        (col("p_partkey") % 7).as("document_id"))
    val ids = nodes.select("id").as[Long].collect().sorted
    val edges = ids.sliding(2).collect { case Array(a, b) => (a, b, a * 10) }
      .toSeq.toDF(":start", ":end", "line_id")
    GraphExport.writeNeo4jCsv(nodes, "id", "Object",
      edges, ":start", ":end", "CONNECTED_TO", dir)
    // single-line typed headers, exactly the neo4j-admin contract
    def headerOf(f: String) =
      scala.io.Source.fromFile(s"$dir/$f").getLines().toSeq
    assert(headerOf("nodes.header.csv") == Seq("id:ID,text_associated," +
      "topX:double,topY:double,bottomX:double,bottomY:double," +
      "document_id:long,:LABEL"))
    assert(headerOf("relationships.header.csv") ==
      Seq(":START_ID,:END_ID,line_id:long,:TYPE"))
    // data parts carry NO header (neo4j-admin rejects repeated
    // headers) and read back losslessly under the header's schema
    val nBack = spark.read
      .schema("id LONG, text_associated STRING, topX DOUBLE, " +
        "topY DOUBLE, bottomX DOUBLE, bottomY DOUBLE, " +
        "document_id LONG, label STRING")
      .csv(s"$dir/nodes")
    assert(nBack.count() == 50)
    assert(nBack.select("label").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("Object"))
    val lost = nodes.join(nBack.drop("label"),
      nodes.columns.toSeq, "left_anti").count()
    assert(lost == 0, s"$lost node rows did not round-trip")
    val eBack = spark.read
      .schema("src LONG, dst LONG, line_id LONG, typ STRING")
      .csv(s"$dir/relationships")
    assert(eBack.count() == edges.count())
    assert(eBack.select("typ").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("CONNECTED_TO"))
    // endpoints reference exported node ids only
    assert(eBack.join(nBack.select(col("id").as("src")), Seq("src"),
      "left_anti").count() == 0)
  }
}
