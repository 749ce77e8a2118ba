package graft.operators

/** The PLUGGABLE media-decode contract behind the §2.8 multimodal
  * operators (m1 dimensions, m2 frame sampling, m3 feature
  * extraction, m4 resize): implement it with a real codec
  * (javax.imageio, an ffmpeg binding, a model-server client) and
  * pass it to the operator — the Spark-side plumbing (schema,
  * mapPartitions batching, digest/exchange discipline, downstream
  * geometry) is identical; only the per-blob byte work changes.
  * This closes the reference's hard-wired inference path
  * (app.py:1545-1970 — YOLO detection + EasyOCR inside the
  * `imageprocess` endpoint) as a CONTRACT rather than a dependency:
  * the reference bakes its models into the handler; here a user
  * drops theirs in without touching the operators.
  *
  * Implementations MUST be Serializable (instances ship to executors
  * inside the mapPartitions closure) and should be per-partition
  * cheap to construct state for — expensive handles (a model
  * session, a codec context) belong in lazy vals so they initialize
  * once per executor, not per row.
  */
trait BlobDecoder extends Serializable {

  /** (width, height) parsed from the blob's container header. */
  def dimensions(blob: Array[Byte]): (Long, Long)

  /** Sampled frames of the blob, in order (a video sampler's decoded
    * planes; an image decoder returns one frame).
    */
  def frames(blob: Array[Byte]): Iterator[Array[Byte]]

  /** Width of the [[features]] vector. */
  def featureBins: Int

  /** Fixed-width feature vector (histogram, pooled embedding, …). */
  def features(blob: Array[Byte]): Array[Long]
}

/** The default DETERMINISTIC stub — this environment ships no codec
  * libraries (SURVEY.md §2.8), so the honest decode is arithmetic
  * over the raw bytes that the DuckDB oracle replays exactly:
  * dimensions from byte length, frames as 64-byte slices, features
  * as a 16-bin byte histogram. The m1–m4 operators are spec-pinned
  * to this stub; swapping in a real decoder changes values, never
  * shapes.
  */
object StubDecoder extends BlobDecoder {

  override def dimensions(blob: Array[Byte]): (Long, Long) =
    (blob.length.toLong % 64 + 16, blob.length.toLong % 48 + 12)

  override def frames(blob: Array[Byte]): Iterator[Array[Byte]] = {
    val n = (blob.length + 63) / 64
    (0 until n).iterator.map { i =>
      val from = i * 64
      java.util.Arrays.copyOfRange(blob, from,
        math.min(from + 64, blob.length))
    }
  }

  override val featureBins: Int = 16

  override def features(blob: Array[Byte]): Array[Long] = {
    val hist = new Array[Long](featureBins)
    var i = 0
    while (i < blob.length) {
      hist(math.min((blob(i) & 0xff) / 8, featureBins - 1)) += 1L
      i += 1
    }
    hist
  }
}
