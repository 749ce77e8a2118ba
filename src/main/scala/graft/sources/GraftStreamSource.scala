package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.SupportsRead
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The GraftTable commit log as a Structured Streaming SOURCE
  * (s16's machinery) — Delta/Iceberg's "stream the table" model:
  *
  * {{{
  *   spark.readStream.format("graft").load(root)
  *     .writeStream.option("checkpointLocation", …)…
  * }}}
  *
  * Offsets ARE commit versions: micro-batch (start, end] serves
  * exactly the files the append commits in that version range added —
  * resolved from the log, never by listing. Because commits are
  * immutable and data files are add-once, a (start, end] slice is
  * DETERMINISTIC forever: Spark's checkpointed offset log + this
  * source's version arithmetic give exactly-once delivery across
  * restarts with no source-side state at all (the replay-safety
  * [[GraftTable.changesSince]] proved in batch, as a stream).
  *
  * The rows are read through Spark's own vectorized parquet reader:
  * the reader FACTORY comes from the same ParquetScan the batch path
  * builds (pushed filters and pruned columns intact), and each
  * micro-batch plans its partitions from a slice-scoped ParquetTable
  * over just that batch's files — so a 1000-executor stream reads a
  * commit's files with the identical split/locality logic a batch
  * read would use.
  *
  * Non-append commits in a streamed range (compact/overwrite/replace)
  * REFUSE rather than re-serving rewritten rows as new — the same
  * honesty rule as the batch change feed; `option("startingVersion",
  * v)` starts the stream past historical rewrites (0 = serve the
  * whole table as the first batch).
  */
class GraftScanWithStream(under: Scan, spark: SparkSession, root: String,
                          options: CaseInsensitiveStringMap) extends Scan {
  override def readSchema(): StructType = under.readSchema()
  override def description(): String = s"graft(${under.description()})"
  override def toBatch: Batch = under.toBatch
  override def toMicroBatchStream(checkpointLocation: String)
      : MicroBatchStream =
    new GraftMicroBatchStream(spark, root, options, under)
}

/** A commit-version offset; json round-trip is the bare number. */
case class GraftOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}

class GraftMicroBatchStream(spark: SparkSession, root: String,
                            options: CaseInsensitiveStringMap,
                            template: Scan) extends MicroBatchStream {

  private val table = GraftTable.forPath(spark, root)
  private val starting =
    Option(options.get("startingVersion")).map(_.toLong).getOrElse(0L)

  override def initialOffset(): Offset = GraftOffset(starting)
  override def latestOffset(): Offset = GraftOffset(table.latestVersion)
  override def deserializeOffset(json: String): Offset =
    GraftOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = () // offsets live in Spark's log
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] = {
    val s0 = start.asInstanceOf[GraftOffset].version
    val e0 = end.asInstanceOf[GraftOffset].version
    val files = table.appendSliceFileSizes(s0, e0)
    if (files.isEmpty) return Array.empty
    // partitioned tables stream their partition COLUMNS too (the
    // snapshot table's restoration contract): the slice plans through
    // the same LOG-BACKED partition-value index the snapshot scan
    // uses, then prunes to the template's read schema — so the
    // PartitionedFiles this slice emits carry partition values of
    // exactly the arity the template's reader factory expects.
    val pcs = table.partMetaAt(e0)
    val payload = table.schemaAt(e0)
    val label = s"graft-stream:$root@($s0,$e0]"
    val slice =
      if (pcs.isEmpty || payload.isEmpty)
        org.apache.spark.sql.graft.shim
          .parquetTable(label, spark, options, files.map(_._1))
      else {
        val partSchema = org.apache.spark.sql.types.StructType(pcs.map(p =>
          org.apache.spark.sql.types.StructField(p.col, p.tpe)).toArray)
        org.apache.spark.sql.graft.shim.partitionedParquetTable(
          label, spark, options, files, payload.get, partSchema,
          dir => GraftTable.partDirValues(pcs, dir))
      }
    val sb = slice.asInstanceOf[SupportsRead].newScanBuilder(options)
    sb match {
      case p: org.apache.spark.sql.connector.read
          .SupportsPushDownRequiredColumns =>
        p.pruneColumns(template.readSchema())
      case _ => ()
    }
    sb.build().toBatch.planInputPartitions()
  }

  /** ONE factory serves every micro-batch: ParquetScan's reader
    * factory binds (schema, pushed filters, conf) — never a file
    * list — so the slice-planned partitions above feed it directly.
    */
  override def createReaderFactory(): PartitionReaderFactory =
    template.toBatch.createReaderFactory()
}
