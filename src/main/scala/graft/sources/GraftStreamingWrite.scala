package graft.sources

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** `df.writeStream.format("graft").start(root)` — the NATIVE DSv2
  * streaming sink for [[GraftTable]], replacing the foreachBatch +
  * appendIdempotent discipline (s15) with the capability a SQL user
  * expects. Semantics are IDENTICAL because the commit path is the
  * same one:
  *
  *   - executors stage each epoch's rows as immutable parquet files
  *     under the table's data dir, through Spark's own parquet
  *     OutputWriter (vectorized-compatible files, real compression);
  *     nothing is visible until a commit references it;
  *   - the driver's epoch commit lands ALL of the epoch's staged
  *     files as ONE idempotent-tagged append — the tag is
  *     `(queryId, epochId)`, so a checkpoint-replayed epoch after
  *     restart is a NO-OP (its re-staged files are deleted, the
  *     ledger answer stands) — exactly-once across crash-replay
  *     without sink-side dedup state;
  *   - schema compatibility and CHECK constraints are enforced per
  *     epoch before the commit (a violating micro-batch aborts its
  *     epoch; the table never holds it).
  *
  * Scale shape: staging cost is proportional to the EPOCH, commit
  * cost is O(files-in-epoch) driver metadata (footer stats read +
  * one log write). The query never lists the table. Append output
  * mode only — Complete/Update need a replace-class commit per epoch
  * (use foreachBatch + overwrite/replacePartitions for those).
  *
  * Writing to a root with NO committed log yet BOOTSTRAPS the table:
  * the first epoch commit records the stream's schema (Delta's
  * create-on-first-write convention).
  */
private[sources] class GraftWriteBuilder(spark: SparkSession, path: String,
                                         info: LogicalWriteInfo,
                                         allowBatch: Boolean = false)
    extends WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {

  // INSERT OVERWRITE arrives as truncate() + write: the batch commit
  // becomes a serializable whole-set replace instead of an append
  private var overwrite = false
  override def truncate(): WriteBuilder = { overwrite = true; this }

  override def build(): Write = new Write {
    override def toStreaming: StreamingWrite = {
      if (overwrite) throw new UnsupportedOperationException(
        "graft streaming writes are APPEND-mode only (Complete/Update " +
          "need a replace per epoch — use foreachBatch + overwrite/" +
          "replacePartitions)")
      new GraftStreamingWrite(spark, path, info.schema(),
        info.queryId())
    }
    /** SQL `INSERT INTO` / `INSERT OVERWRITE` / CTAS through
      * [[GraftCatalog]]. Deliberately NOT reachable from the
      * path-based format (`allowBatch=false` there): df.write keeps
      * its documented v1 fallback into the atomic-commit save modes.
      */
    override def toBatch: BatchWrite =
      if (allowBatch) new GraftBatchWrite(spark, path, info.schema(),
        overwrite)
      else throw new UnsupportedOperationException(
        "graft v2 batch writes are catalog-scoped (INSERT INTO / " +
          "CTAS); df.write.format(\"graft\") rides the v1 commit path")
  }
}

/** One SQL batch write = one atomic commit: executors stage parquet
  * under the table root (never visible until referenced), the driver
  * lands every staged file as ONE append — or, for INSERT OVERWRITE,
  * ONE serializable whole-set replace. Constraints gate the batch;
  * abort deletes the staged files.
  */
private class GraftBatchWrite(spark: SparkSession, path: String,
                              schema: StructType, overwrite: Boolean)
    extends BatchWrite {
  private val t = GraftTable.forPath(spark, path)
  // fail fast at planning on an incompatible insert schema (an
  // overwrite may legitimately change the schema, like the verb)
  if (!overwrite) t.validateAppendSchema(schema)

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DataWriterFactory = {
    val sub = s"data/${java.util.UUID.randomUUID.toString.take(12)}"
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    // an overwrite RESETS column mapping with the live set, so its
    // files stage under the new schema's own (logical) names; appends
    // stage under the active physical names
    val physical =
      if (overwrite) schema else t.physicalWriteSchema(schema)
    val factory = new ParquetFileFormat()
      .prepareWrite(spark, job, Map.empty, physical)
    new GraftStagedWriterFactory(path, sub, physical, factory,
      new SerializableConf(job.getConfiguration))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val staged = messages.toSeq.collect { case GraftStagedFile(rel) => rel }
    t.commitStagedFiles(staged, schema, tag = None, overwrite = overwrite)
    ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.toSeq.collect { case GraftStagedFile(rel) => rel }
      .foreach(t.deleteStaged)
}

private class GraftStreamingWrite(spark: SparkSession, path: String,
                                  schema: StructType, queryId: String)
    extends StreamingWrite {

  private val t = GraftTable.forPath(spark, path)
  // fail fast at query START on an incompatible stream schema — not
  // epochs later at the first commit (bootstrap: no recorded schema
  // yet, anything goes)
  t.validateAppendSchema(schema)

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : StreamingDataWriterFactory = {
    // one staging namespace per query RUN; files name their epoch,
    // partition and task attempt, so retries never collide and only
    // committed files are ever referenced by the log
    val sub = s"data/${java.util.UUID.randomUUID.toString.take(12)}"
    new Path(path, sub) // validated lazily by the writers
    val job = Job.getInstance(
      spark.sessionState.newHadoopConf())
    // stage under PHYSICAL names (column mapping); rows carry no
    // names, so only the parquet file schema translates
    val physical = t.physicalWriteSchema(schema)
    val factory = new ParquetFileFormat()
      .prepareWrite(spark, job, Map.empty, physical)
    new GraftStagedWriterFactory(path, sub, physical, factory,
      new SerializableConf(job.getConfiguration))
  }

  /** The EPOCH COMMIT: every staged file of `epochId`, as one
    * idempotent-tagged append. Replay ⇒ staged duplicates deleted,
    * no second commit.
    */
  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit = {
    val staged = messages.toSeq.collect {
      case GraftStagedFile(rel) => rel
    }
    t.commitStreamEpoch(staged, s"stream:$queryId:$epochId", schema)
    ()
  }

  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit =
    messages.toSeq.collect { case GraftStagedFile(rel) => rel }
      .foreach(t.deleteStaged)
}

/** One staged parquet file, named by its table-relative path. */
private case class GraftStagedFile(rel: String) extends WriterCommitMessage

private class GraftStagedWriterFactory(root: String, sub: String,
                                       schema: StructType,
                                       factory: OutputWriterFactory,
                                       conf: SerializableConf)
    extends StreamingDataWriterFactory
    with org.apache.spark.sql.connector.write.DataWriterFactory {

  private def mk(partitionId: Int, taskId: Long,
                 slot: String): DataWriter[InternalRow] = {
    val ctx = new TaskAttemptContextImpl(conf.value,
      new TaskAttemptID(new TaskID(new JobID("graft-stage", 0),
        TaskType.MAP, partitionId), (taskId % Int.MaxValue).toInt))
    val rel = s"$sub/part-$slot-$partitionId-$taskId" +
      factory.getFileExtension(ctx)
    new GraftStreamDataWriter(root, rel, schema, factory, ctx, conf.value)
  }

  // streaming: files name their epoch so replays never collide
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    mk(partitionId, taskId, epochId.toString)

  // batch: one slot per write job (the sub dir is already unique)
  override def createWriter(partitionId: Int,
                            taskId: Long): DataWriter[InternalRow] =
    mk(partitionId, taskId, "b")
}

private class GraftStreamDataWriter(root: String, rel: String,
                                    schema: StructType,
                                    factory: OutputWriterFactory,
                                    ctx: TaskAttemptContextImpl,
                                    conf: Configuration)
    extends DataWriter[InternalRow] {
  private val out = factory.newInstance(s"$root/$rel", schema, ctx)
  private var rows = 0L

  override def write(record: InternalRow): Unit = {
    out.write(record); rows += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    GraftStagedFile(rel)
  }

  override def abort(): Unit = {
    try out.close() catch { case scala.util.control.NonFatal(_) => () }
    val p = new Path(s"$root/$rel")
    val fs = p.getFileSystem(conf)
    if (fs.exists(p)) fs.delete(p, false)
    ()
  }

  override def close(): Unit = ()
}

/** Hadoop Configuration is not java-serializable; this carries it
  * task-ward by its own key-value wire format (what Spark's internal
  * SerializableConfiguration does).
  */
private class SerializableConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
