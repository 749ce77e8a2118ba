package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Sources/sinks (SURVEY.md §2.9). The reference ingests CSV
  * (`Files/Master_data.csv`), Excel uploads and JSON documents
  * (`app.py:6063`, `app.py:2219`); Spark-side that maps to schema-
  * enforced csv/json readers (no runtime inference at 100 TB — a
  * schema mismatch should fail the job, not silently null out) and a
  * partitioned parquet writer for the lake layout.
  */
object Readers {

  /** CSV with explicit schema; malformed rows fail loudly
    * (FAILFAST), matching warehouse-load semantics.
    */
  def csv(s: SparkSession, path: String, schema: StructType,
          header: Boolean = true, delimiter: String = ","): DataFrame =
    s.read.schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "FAILFAST")
      .csv(path)

  /** Newline-delimited JSON with explicit schema. */
  def jsonLines(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** Parquet (the lake's native format). */
  def parquet(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)

  /** ORC read/write (second columnar format the lake may carry). */
  def orc(s: SparkSession, path: String): DataFrame = s.read.orc(path)
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** Avro read/write — the row-oriented interchange format. Spark 4
    * ships the implementation inside spark-sql but does not list it
    * in DataSourceRegister (the "avro" shortname errors), so the
    * format is addressed by its implementing class.
    */
  private val AvroFormat = "org.apache.spark.sql.avro.AvroFileFormat"
  def avro(s: SparkSession, path: String): DataFrame =
    s.read.format(AvroFormat).load(path)
  def writeAvro(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).format(AvroFormat).save(path)

  /** JDBC passthrough — the reference's entire tag-registry REST
    * surface is warehouse SQL over JDBC (`app.py:1209-1292`,
    * `4826-5200`, `7094-7260`). Exercised offline against Derby
    * embedded (shipped with Spark for the Hive metastore); any other
    * warehouse is the same call with its url/driver.
    *
    * `jdbcPartitioned` is the 100 TB shape: numPartitions parallel
    * range-bounded reads instead of one connection streaming the
    * whole table through a single task. Spark pushes filters and
    * column pruning into the remote SQL for both forms.
    */
  def jdbc(s: SparkSession, url: String, table: String,
           driver: String): DataFrame =
    s.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("driver", driver).load()

  def jdbcPartitioned(s: SparkSession, url: String, table: String,
                      driver: String, partitionColumn: String,
                      lowerBound: Long, upperBound: Long,
                      numPartitions: Int): DataFrame =
    s.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("driver", driver)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound).option("upperBound", upperBound)
      .option("numPartitions", numPartitions).load()

  def writeJdbc(df: DataFrame, url: String, table: String,
                driver: String): Unit =
    df.write.mode(SaveMode.Overwrite).format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("driver", driver).save()

  /** Partitioned parquet writer: `partitionBy` columns become the
    * directory layout so downstream scans partition-prune. At scale,
    * pick low-cardinality partition keys (date, region) — never
    * high-cardinality ids, which would create millions of dirs.
    */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Schema-evolution read: a lake directory whose older files lack
    * columns added later reads as the UNION schema, old rows null for
    * new columns (the additive-evolution contract — the only kind a
    * 100 TB lake can afford, since a rename/retype means rewriting
    * every historical file). `mergeSchema` is per-read here, not the
    * session default: footer-merging lists every file's schema, a
    * planning cost to pay only where evolution actually happened.
    */
  def parquetEvolved(s: SparkSession, path: String): DataFrame =
    s.read.option("mergeSchema", "true").parquet(path)

  /** Bucketed managed table: rows are hash-bucketed (and sorted) on
    * the join key at write time, so two tables bucketed the same way
    * join with NO shuffle — the pre-partitioning strategy for the
    * repeatedly-joined fact tables at 100 TB (BucketingSpec asserts
    * the shuffle-free plan).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
}
