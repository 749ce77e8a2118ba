package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets.UTF_8

/** Training-shard export sink — the WebDataset-style delivery format:
  * documents packed in doc_id order into size-bounded POSIX-ustar tar
  * shards (`shard-NNNNNN.tar`, each entry `docs/<doc_id>.txt`), plus a
  * parquet `_index` (shard → doc range, count, payload bytes) so a
  * loader can route to one shard without opening any tar. Plain tar is
  * the point: every training-data loader (WebDataset, torchdata, a
  * shell script) reads it with no library beyond the format itself.
  *
  * Shard assignment is PURE ARITHMETIC, not a stateful packer: each
  * doc's exclusive prefix of padded-entry bytes (header 512 + data
  * rounded up to 512) is computed by TextOps.exclusivePrefixSum —
  * d23's hierarchical construction, no global running-sum window — and
  * `shard_id = prefix div targetBytes`. Documents are never split, so
  * a shard overruns its target by AT MOST one entry (bound asserted in
  * the spec); every re-run of the same corpus produces byte-identical
  * shards (fixed mtime/uid/mode, deterministic order), which makes the
  * export diffable and cache-friendly.
  *
  * Scale shape: one prefix-sum pass + one exchange keyed on the
  * NUMERIC shard id (the only time full text moves), then each task
  * streams its shards to the filesystem via the Hadoop FileSystem API
  * — works against local disk here and HDFS/object stores on a
  * cluster, no driver-side collect anywhere.
  */
object ShardExport {

  private val Block = 512L

  /** (doc_id, text) → + entry_bytes, start_off, shard_id. */
  def assign(docs: DataFrame, targetBytes: Long, grp: Long = 8192): DataFrame = {
    val sized = docs
      .select(col("doc_id"), col("text"),
        (lit(Block) +
          expr(s"((octet_length(text) + ${Block - 1}) div $Block) * $Block")
        ).as("entry_bytes"))
    graft.operators.TextOps
      .exclusivePrefixSum(sized, "doc_id", "entry_bytes", "start_off", grp)
      .withColumn("shard_id", expr(s"start_off div $targetBytes"))
  }

  /** Write `docs` (doc_id, text) as tar shards + `_index` parquet. */
  def write(docs: DataFrame, outDir: String, targetBytes: Long): Unit = {
    val a = assign(docs, targetBytes).cache()
    try {
      a.select(col("shard_id"), col("doc_id"), col("text"))
        .repartition(col("shard_id"))
        .sortWithinPartitions("shard_id", "doc_id")
        .foreachPartition { (rows: Iterator[Row]) =>
          // fresh Configuration on the executor: resolves the scheme of
          // `outDir` (file:// here, hdfs://… on a cluster)
          val conf = new org.apache.hadoop.conf.Configuration()
          var out: java.io.OutputStream = null
          var cur = -1L
          try {
            rows.foreach { r =>
              val shard = r.getLong(0)
              if (shard != cur) {
                if (out != null) { writeTrailer(out); out.close() }
                val path = new org.apache.hadoop.fs.Path(
                  f"$outDir%s/shard-$shard%06d.tar")
                out = path.getFileSystem(conf).create(path, true)
                cur = shard
              }
              writeEntry(out, s"docs/${r.getLong(1)}.txt",
                r.getString(2).getBytes(UTF_8))
            }
          } finally {
            if (out != null) { writeTrailer(out); out.close() }
          }
        }
      a.groupBy("shard_id")
        .agg(count(lit(1)).as("n_docs"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"),
          sum("entry_bytes").as("payload_bytes"))
        .coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(s"$outDir/_index")
    } finally a.unpersist()
  }

  def readIndex(s: SparkSession, outDir: String): DataFrame =
    s.read.parquet(s"$outDir/_index")

  /** One ustar header block + data padded to the 512 boundary. */
  private def writeEntry(out: java.io.OutputStream, name: String,
                         data: Array[Byte]): Unit = {
    val h = new Array[Byte](Block.toInt)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes(UTF_8); System.arraycopy(b, 0, h, off, b.length)
    }
    require(name.getBytes(UTF_8).length <= 100, s"tar name too long: $name")
    put(0, name)
    put(100, "0000644\u0000")               // mode
    put(108, "0000000\u0000")               // uid
    put(116, "0000000\u0000")               // gid
    put(124, f"${data.length}%011o\u0000")  // size
    put(136, "00000000000\u0000")           // mtime: fixed 0 → reproducible
    put(148, "        ")                    // chksum: spaces while summing
    h(156) = '0'                            // typeflag: regular file
    put(257, "ustar\u0000")                 // magic
    put(263, "00")                          // version
    var sum = 0L
    h.foreach(b => sum += (b & 0xff))
    put(148, f"$sum%06o\u0000 ")
    out.write(h)
    out.write(data)
    val pad = ((Block - data.length % Block) % Block).toInt
    if (pad > 0) out.write(new Array[Byte](pad))
  }

  /** End-of-archive marker: two zero blocks. */
  private def writeTrailer(out: java.io.OutputStream): Unit =
    out.write(new Array[Byte](2 * Block.toInt))

  /** Parse every shard back into (doc_id, text, shard_id) — the spec's
    * round-trip reader and a working example of how little a consumer
    * needs (header walk + size field; no tar library).
    */
  def readShards(s: SparkSession, outDir: String): Seq[(Long, String, Long)] = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val dir = new org.apache.hadoop.fs.Path(outDir)
    val fs = dir.getFileSystem(conf)
    fs.listStatus(dir).toSeq
      .filter(_.getPath.getName.matches("shard-\\d+\\.tar"))
      .sortBy(_.getPath.getName)
      .flatMap { st =>
        val shard = st.getPath.getName.stripPrefix("shard-")
          .stripSuffix(".tar").toLong
        val in = fs.open(st.getPath)
        // whole-shard buffering caps at Int.MaxValue bytes; a larger
        // shard (caller-controlled targetBytes) would silently
        // truncate getLen.toInt to a negative/small int — fail loudly
        require(st.getLen <= Int.MaxValue,
          s"shard ${st.getPath.getName} is ${st.getLen} bytes, beyond " +
            "the 2 GiB whole-file read path; lower targetBytes or " +
            "stream header-by-header")
        val bytes = new Array[Byte](st.getLen.toInt)
        in.readFully(0, bytes)
        in.close()
        var off = 0
        val docs = Seq.newBuilder[(Long, String, Long)]
        var done = false
        while (!done && off + Block.toInt <= bytes.length) {
          val name = new String(bytes, off, 100, UTF_8).takeWhile(_ != '\u0000')
          if (name.isEmpty) done = true // zero trailer block
          else {
            val size = java.lang.Long.parseLong(
              new String(bytes, off + 124, 11, UTF_8).trim, 8)
            // verify the checksum so a corrupted shard fails loudly
            var sum = 0L
            (0 until Block.toInt).foreach { i =>
              sum += (if (i >= 148 && i < 156) ' '.toLong
                      else bytes(off + i) & 0xff)
            }
            val stored = java.lang.Long.parseLong(
              new String(bytes, off + 148, 6, UTF_8).trim, 8)
            require(sum == stored, s"tar checksum mismatch in ${st.getPath}")
            val data = new String(bytes, off + Block.toInt, size.toInt, UTF_8)
            val id = name.stripPrefix("docs/").stripSuffix(".txt").toLong
            docs += ((id, data, shard))
            off += Block.toInt + (((size + Block - 1) / Block) * Block).toInt
          }
        }
        docs.result()
      }
  }
}
