package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{GearChunks, GearCuts, RollingHash}

/** Generative invariants over the custom expression layer (interpreted
  * eval path; the codegen path is cross-checked on real data in
  * CodegenSpec). These run WITHOUT a SparkSession — pure expression
  * evaluation over ScalaCheck-generated inputs, so they sweep the
  * input space (empty, single-byte, non-ASCII, adversarial repeats)
  * far wider than corpus-backed specs can.
  */
class PropertySpec extends AnyFunSuite {
  private val params = SCTest.Parameters.default.withMinSuccessfulTests(300)

  private def check(name: String, p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, s"$name: ${r.status}")
  }

  private def chunksOf(b: Array[Byte]): Seq[(Int, Int, Array[Byte])] = {
    val arr = GearChunks(Literal.create(b, BinaryType)).eval(null)
      .asInstanceOf[ArrayData]
    (0 until arr.numElements()).map { i =>
      val row = arr.getStruct(i, 3)
      (row.getInt(0), row.getInt(1), row.getBinary(2))
    }
  }

  test("GearChunks tiles ANY byte array exactly with correct digests") {
    val bytesGen = Gen.choose(0, 600)
      .flatMap(n => Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)))
      .map(_.toArray)
    check("tiling", Prop.forAll(bytesGen) { b =>
      val ch = chunksOf(b)
      val md = java.security.MessageDigest.getInstance("SHA-256")
      var expectOff = 1
      var ok = true
      ch.foreach { case (off, len, sha) =>
        md.reset(); md.update(b, off - 1, len)
        ok = ok && off == expectOff && len > 0 &&
          java.util.Arrays.equals(sha, md.digest())
        expectOff = off + len
      }
      // empty input -> no chunks; else chunks cover [1, n] exactly
      ok && (if (b.isEmpty) ch.isEmpty else expectOff == b.length + 1) &&
        chunksOf(b).map(c => (c._1, c._2, c._3.toSeq)) ==
          ch.map(c => (c._1, c._2, c._3.toSeq)) // deterministic
    })
  }

  test("GearCuts boundaries == GearChunks manifest ends for ANY bytes") {
    val bytesGen = Gen.choose(0, 400)
      .flatMap(n => Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)))
      .map(_.toArray)
    check("cuts==manifest", Prop.forAll(bytesGen) { b =>
      val cuts = GearCuts(Literal.create(b, BinaryType)).eval(null)
        .asInstanceOf[ArrayData].toIntArray().toSeq
      val ends = chunksOf(b).map { case (off, len, _) => off + len - 1 }
      cuts == ends
    })
  }

  test("StridedDHash matches the positional sampling rule for ANY string") {
    // independent restatement: direct position formula over code
    // points (the expression WALKS the string once; this indexes) —
    // agreement over generated unicode incl. astral-plane code points
    // is the evidence the one-pass walk visits exactly the sampled
    // positions
    import org.apache.spark.sql.types.StringType
    def ref(sIn: String, bits: Int): Long = {
      val cps = sIn.codePoints.toArray
      val len = cps.length
      val samples = Array.fill(bits + 1)(0)
      if (len > 0) {
        val stride = math.max(1, len / (bits + 1))
        for (j <- 0 to bits)
          samples(j) = cps(math.min(1 + j * stride, len) - 1)
      }
      (0 until bits).map(i =>
        if (samples(i) < samples(i + 1)) 1L << i else 0L).sum
    }
    val cpGen = Gen.frequency(
      6 -> Gen.choose(0x20, 0x7e),         // ascii
      2 -> Gen.choose(0xa0, 0x2fff),       // multi-byte BMP
      1 -> Gen.choose(0x10000, 0x10fff))   // astral (surrogate pairs)
    val strGen = Gen.choose(0, 200)
      .flatMap(n => Gen.listOfN(n, cpGen))
      .map(cps => new String(cps.toArray, 0, cps.length))
    val bitsGen = Gen.oneOf(1, 2, 4, 16, 28, 52, 62)
    check("strided_dhash", Prop.forAll(strGen, bitsGen) { (s, bits) =>
      graft.functions.StridedDHash(
        Literal.create(UTF8String.fromString(s), StringType), bits)
        .eval(null).asInstanceOf[Long] == ref(s, bits)
    })
  }

  test("RollingHash matches the documented recurrence for ANY string") {
    check("rolling", Prop.forAll(Gen.asciiStr, Gen.alphaNumStr) { (a, bTail) =>
      val s = a + bTail + "é世" // force non-ASCII code units too
      val got = RollingHash(Literal(UTF8String.fromString(s)))
        .eval(null).asInstanceOf[Long]
      var h = 0L
      s.foreach(c => h = (h * 31 + c) % 1000000007L)
      got == h && h >= 0
    })
  }
}
