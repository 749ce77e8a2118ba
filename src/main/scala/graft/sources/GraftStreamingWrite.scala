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
                                         info: LogicalWriteInfo)
    extends WriteBuilder {
  override def build(): Write = new Write {
    override def toStreaming: StreamingWrite =
      new GraftStreamingWrite(spark, path, info.schema(),
        info.queryId())
    override def toBatch: BatchWrite =
      throw new UnsupportedOperationException(
        "graft v2 batch writes go through df.write.format(\"graft\") " +
          "(the v1 commit path); only streaming uses the v2 write")
  }
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
    new GraftStreamWriterFactory(path, sub, physical, factory,
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

private class GraftStreamWriterFactory(root: String, sub: String,
                                       schema: StructType,
                                       factory: OutputWriterFactory,
                                       conf: SerializableConf)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] = {
    val ctx = new TaskAttemptContextImpl(conf.value,
      new TaskAttemptID(new TaskID(new JobID("graft-stream", 0),
        TaskType.MAP, partitionId), (taskId % Int.MaxValue).toInt))
    val rel = s"$sub/part-$epochId-$partitionId-$taskId" +
      factory.getFileExtension(ctx)
    new GraftStreamDataWriter(root, rel, schema, factory, ctx, conf.value)
  }
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
