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

/** A REAL codec behind the contract — `javax.imageio`, which ships
  * IN THE JDK (PNG / BMP / GIF / JPEG / WBMP readers registered by
  * default), so the decodable half of the reference's image path
  * (`imageprocess`, app.py:1545-1970) is served with zero new
  * dependencies: dimensions from the container header (no pixel
  * decode), frames as horizontal ROW-STRIPS of the decoded ARGB
  * plane (the video-sampler shape over a still), features as a
  * LUMINANCE histogram (ITU-R 601 weights). Model inference
  * (YOLO / OCR) stays a documented non-goal — no model runtime in
  * the JDK; that half remains a user-supplied decoder.
  *
  * Stateless and Serializable (the contract's executor-shipping
  * rule); ImageIO reader instances are created per call — they are
  * not safe to share across threads.
  */
class ImageIoDecoder(stripRows: Int = 16,
                     override val featureBins: Int = 16)
    extends BlobDecoder {
  require(stripRows > 0 && featureBins > 0 && 256 % featureBins == 0,
    "stripRows must be positive and featureBins a divisor of 256")

  // ImageIO defaults to FILE-cached image streams (useCache=true):
  // every read/createImageInputStream over an in-memory blob creates,
  // fills and deletes a temp file — 3 temp files per m9 row, the
  // dominant cost of the decode path at corpus scale (round 18,
  // guide §1.2 "per-task work"). Memory-cached streams are
  // bit-identical to the codec; blobs here are KB-sized. The flag is
  // a JVM-wide static — setting it at decoder construction covers
  // every executor thread that instantiates one (idempotent).
  javax.imageio.ImageIO.setUseCache(false)

  private def decode(blob: Array[Byte]): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(blob))
    if (img == null) throw new IllegalArgumentException(
      "undecodable image blob: no registered ImageIO reader matched " +
        "the container header")
    img
  }

  /** Header-only: `ImageReader.getWidth/getHeight` parse the
    * container header without decoding the pixel plane — the shape a
    * 100 TB metadata pass wants (m1 never pays for pixels).
    */
  override def dimensions(blob: Array[Byte]): (Long, Long) = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(blob))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) throw new IllegalArgumentException(
        "undecodable image blob: no registered ImageIO reader matched " +
          "the container header")
      val rd = readers.next()
      try {
        rd.setInput(iis)
        (rd.getWidth(0).toLong, rd.getHeight(0).toLong)
      } finally rd.dispose()
    } finally iis.close()
  }

  /** Row-strips of the ARGB plane, top to bottom: strip i covers rows
    * [i·stripRows, min((i+1)·stripRows, h)), each pixel 4 big-endian
    * bytes — ⌈h / stripRows⌉ frames in total.
    */
  override def frames(blob: Array[Byte]): Iterator[Array[Byte]] = {
    val img = decode(blob)
    val w = img.getWidth
    val h = img.getHeight
    (0 until h by stripRows).iterator.map { y0 =>
      val rows = math.min(stripRows, h - y0)
      val px = img.getRGB(0, y0, w, rows, null, 0, w)
      val bb = java.nio.ByteBuffer.allocate(px.length * 4)
      px.foreach { p => bb.putInt(p); () }
      bb.array()
    }
  }

  /** Luminance histogram over the decoded plane: lum ∈ [0, 255] via
    * the ITU-R 601 integer weights, binned uniformly.
    */
  override def features(blob: Array[Byte]): Array[Long] = {
    val img = decode(blob)
    val hist = new Array[Long](featureBins)
    val px = img.getRGB(0, 0, img.getWidth, img.getHeight,
      null, 0, img.getWidth)
    val per = 256 / featureBins
    var i = 0
    while (i < px.length) {
      val p = px(i)
      val lum = (((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 +
        (p & 0xff) * 114) / 1000
      hist(lum / per) += 1L
      i += 1
    }
    hist
  }
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
