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
}
