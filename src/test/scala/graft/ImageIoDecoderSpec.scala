package graft

import graft.operators.ImageIoDecoder
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** The REAL codec behind the BlobDecoder contract (VERDICT r12 item
  * 3): `javax.imageio` is JDK-only, so PNG/BMP decode needs no new
  * dependency. The spec generates tiny images with known pixel
  * content and checks dimensions (header-only), row-strip frames and
  * the luminance histogram against hand-computed values, then drives
  * the decoder through a Spark mapPartitions closure (the
  * executor-shipping shape the m1–m4 operators use). StubDecoder
  * stays the oracled default — a real codec changes values, never
  * shapes.
  */
class ImageIoDecoderSpec extends SparkSpec {

  private def img(w: Int, h: Int)(px: (Int, Int) => Int): BufferedImage = {
    val b = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) b.setRGB(x, y, px(x, y))
    b
  }

  private def bytes(b: BufferedImage, fmt: String): Array[Byte] = {
    val os = new ByteArrayOutputStream()
    assert(ImageIO.write(b, fmt, os), s"no JDK writer for $fmt")
    os.toByteArray
  }

  test("dimensions come from the real container header, PNG and BMP alike") {
    val dec = new ImageIoDecoder()
    val png = bytes(img(37, 21)((_, _) => 0x123456), "png")
    val bmp = bytes(img(8, 5)((_, _) => 0xffffff), "bmp")
    assert(dec.dimensions(png) == ((37L, 21L)))
    assert(dec.dimensions(bmp) == ((8L, 5L)))
    // garbage refuses loudly, never returns fake dimensions
    val e = intercept[IllegalArgumentException] {
      dec.dimensions(Array.fill[Byte](64)(7))
    }
    assert(e.getMessage.contains("undecodable"))
    ()
  }

  test("frames are row-strips covering the exact pixel plane") {
    // 6x10 image, stripRows=4 -> strips of 4+4+2 rows
    val dec = new ImageIoDecoder(stripRows = 4)
    val blob = bytes(img(6, 10)((x, y) => (x << 16) | y), "png")
    val fs = dec.frames(blob).toSeq
    assert(fs.map(_.length) == Seq(6 * 4 * 4, 6 * 4 * 4, 6 * 2 * 4))
    // first pixel of strip 2 is row y=8, x=0: ARGB 0xFF000008
    val bb = java.nio.ByteBuffer.wrap(fs(2))
    assert((bb.getInt() & 0xffffff) == 8)
    ()
  }

  test("features are a luminance histogram with ITU-R 601 weights") {
    val dec = new ImageIoDecoder(featureBins = 16)
    // half black (lum 0 -> bin 0), half white (lum 255 -> bin 15)
    val blob = bytes(img(10, 8)((x, _) =>
      if (x < 5) 0x000000 else 0xffffff), "png")
    val hist = dec.features(blob)
    assert(hist(0) == 40L && hist(15) == 40L)
    assert(hist.sum == 80L)
    // pure green: lum = 587*255/1000 = 149 -> bin 9
    val green = bytes(img(4, 4)((_, _) => 0x00ff00), "png")
    val gh = dec.features(green)
    assert(gh(149 / 16) == 16L && gh.sum == 16L)
    ()
  }

  test("the decoder ships to executors: m1's mapPartitions shape over real PNG blobs") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val dec = new ImageIoDecoder()
    val blobs = (1 to 8).map(i =>
      Row(i.toLong, bytes(img(16 + i, 9)((_, _) => i * 0x010101), "png")))
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("blob", BinaryType, nullable = false)))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("n_frames", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(blobs, 3), schema)
    val got = df.mapPartitions { rows =>
      rows.map { r =>
        val blob = r.getAs[Array[Byte]](1)
        val (w, h) = dec.dimensions(blob)
        Row(r.getLong(0), w, h, dec.frames(blob).size.toLong)
      }
    }(enc).collect().sortBy(_.getLong(0))
    got.foreach { r =>
      val i = r.getLong(0)
      assert(r.getLong(1) == 16 + i && r.getLong(2) == 9L)
      assert(r.getLong(3) == 1L) // 9 rows, default 16-row strips
    }
    ()
  }
}
