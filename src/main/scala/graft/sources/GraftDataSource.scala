package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `spark.read.format("graft")` — the SQL-user surface of
  * [[GraftTable]]: resolve a committed snapshot from the table's log
  * (latest, or `versionAsOf`), then serve it through Spark's OWN v2
  * parquet table over the resolved file list — so the scan is the
  * real ParquetScan with vectorized reads, filter pushdown and column
  * pruning intact (a hand-rolled BaseRelation/RDD[Row] bridge would
  * silently drop all three; GraftDataSourceSpec asserts PushedFilters
  * on the plan to keep that true). Discovery goes through the
  * standard `DataSourceRegister` service file, so
  *
  * {{{
  *   spark.read.format("graft").load(root)                       // latest snapshot
  *   spark.read.format("graft").option("versionAsOf", 2).load(root) // time travel
  * }}}
  *
  * and `CREATE TABLE t USING graft OPTIONS (path '…')` all work with
  * no imports. Snapshot isolation holds by construction: the file
  * list is pinned when the relation resolves, and removed files stay
  * on disk (GraftTable's logical removes), so a concurrent
  * compact/overwrite can't perturb a running query.
  */
class GraftDataSource extends org.apache.spark.sql.connector.catalog.TableProvider
    with DataSourceRegister {

  override def shortName(): String = "graft"

  private def resolveTable(options: CaseInsensitiveStringMap): Table = {
    val spark = SparkSession.active
    val path = options.get("path")
    require(path != null && path.nonEmpty,
      "the graft format needs a table root: .load(<root>) or option(\"path\", …)")
    val t = GraftTable.forPath(spark, path)
    val version = Option(options.get("versionAsOf")).map(_.toLong)
      .getOrElse {
        require(t.latestVersion > 0, s"no graft table at $path (empty log)")
        t.latestVersion
      }
    org.apache.spark.sql.graft.shim.parquetTable(
      s"graft:$path@v$version", spark, options, t.filesAsOf(version))
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    resolveTable(options).schema()

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    resolveTable(new CaseInsensitiveStringMap(properties))

  override def supportsExternalMetadata(): Boolean = false
}
