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

  test("BpeCountApprox equals the regex segmenter for ANY string") {
    // the d38 fused segmenter's contract: identical to
    //   Σ over matches of [A-Za-z]+|[0-9]+|[^A-Za-z0-9 ] of
    //   (codePointCount(match) + 3) div 4
    // swept over generated strings: letter/digit runs at boundaries,
    // punctuation clusters, spaces, non-ASCII, surrogate pairs
    val piece = Gen.oneOf(
      Gen.choose(1, 9).flatMap(n => Gen.listOfN(n, Gen.alphaChar).map(_.mkString)),
      Gen.choose(1, 9).flatMap(n => Gen.listOfN(n, Gen.numChar).map(_.mkString)),
      Gen.oneOf(" ", "  ", "!", "?!", "...", "é", "世界", "👍", "a👍9"))
    val strGen = Gen.choose(0, 30)
      .flatMap(n => Gen.listOfN(n, piece)).map(_.mkString)
    val pat = java.util.regex.Pattern.compile("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]")
    check("bpe", Prop.forAll(strGen) { s =>
      val got = graft.functions.BpeCountApprox(
        Literal(UTF8String.fromString(s))).eval(null).asInstanceOf[Long]
      val m = pat.matcher(s)
      var want = 0L
      while (m.find()) {
        val cp = s.codePointCount(m.start, m.end)
        want += (cp + 3) / 4
      }
      got == want
    })
  }

  test("SortedIntersectCount: exact without a threshold; bail-safe with one, for ANY sorted-distinct arrays") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val arrGen = Gen.listOf(Gen.choose(0L, 120L)).map(_.distinct.sorted)
    def cnt(a: Seq[Long], b: Seq[Long], needed: Long): Long =
      graft.functions.SortedIntersectCount.count(
        new GenericArrayData(a.toArray),
        new GenericArrayData(b.toArray), needed)
    check("sic", Prop.forAll(arrGen, arrGen, Gen.choose(0L, 40L)) {
      (a, b, n) =>
        val exact = (a.toSet intersect b.toSet).size.toLong
        val full = cnt(a, b, 0L)
        val bailed = cnt(a, b, n)
        // no threshold -> exact; with one -> never over-counts, and
        // the pass/fail verdict vs the threshold matches exact's
        // (a pair that can reach `n` is counted EXACTLY — the
        // verification-join contract)
        full == exact && bailed <= exact &&
          ((bailed >= n) == (exact >= n)) &&
          (exact < n || bailed == exact)
    })
  }

  test("d2's prefix filter is LOSSLESS for Jaccard >= 0.8 on ANY shingle-set family") {
    // the exact arithmetic of the scale plan, modelled element-wise:
    //   plen = sz - (4*sz + 4) div 5 + 1   (ascending-hash prefix)
    //   size filter 5*min >= 4*max
    //   exact verify shared/(sa+sb-shared) >= 0.8
    // must produce the SAME pair set as all-pairs exact Jaccard —
    // the theorem the plan switch's oracle-invisibility rests on.
    // Families are generated near-dup-rich: a base set plus mutated
    // copies (drop/add up to ~25% of elements) so threshold-grazing
    // pairs actually occur.
    val baseGen = Gen.choose(5, 24).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0L, 40L)).map(_.toSet))
    val famGen = for {
      base <- baseGen
      k <- Gen.choose(2, 7)
      muts <- Gen.listOfN(k, for {
        drops <- Gen.someOf(base)
        adds <- Gen.listOfN(3, Gen.choose(41L, 60L))
        keepDrop <- Gen.choose(0, math.max(1, base.size / 4))
      } yield (base -- drops.take(keepDrop) ++ adds.take(
        if (base.size > 8) 2 else 0)).toSet)
    } yield (base +: muts).filter(_.nonEmpty).zipWithIndex
      .map { case (s0, i) => (i.toLong, s0) }
    // the prefix plan's EXACT filter stack, modelled element-wise and
    // checked against the naive plan's capped arithmetic — at TWO cap
    // settings: unhit (the production default's regime) and a
    // deliberately BINDING dfCap=3 (ADVICE r12: the plans must agree
    // when the cap bites, not only while it is a no-op). Naive-plan
    // semantics: `shared` counts sub-cap shingles only, denominators
    // use FULL set sizes.
    def agree(docs: Seq[(Long, Set[Long])], dfCap: Int): Boolean = {
      val df = docs.flatMap(_._2).groupBy(identity).view
        .mapValues(_.size).toMap
      def capped(s0: Set[Long]): Set[Long] = s0.filter(df(_) <= dfCap)
      def sharedC(a: Set[Long], b: Set[Long]): Int =
        (capped(a) intersect capped(b)).size
      def jaccN(a: Set[Long], b: Set[Long]): Double =
        sharedC(a, b).toDouble / (a.size + b.size - sharedC(a, b))
      val naive = (for {
        (ia, sa) <- docs; (ib, sb) <- docs
        if ia < ib && jaccN(sa, sb) >= 0.8
      } yield (ia, ib)).toSet
      // prefix plan: capped-universe prefixes WITH POSITIONS, the
      // capped-size ratio filter and the PPJoin positional bound
      // min(i,j) + min(szc_a−i, szc_b−j) >= ceil(4(szc_a+szc_b)/9),
      // then exact verification in the naive arithmetic
      def prefixPos(s0: Set[Long]): Map[Long, Int] = {
        val sc = capped(s0).toSeq.sorted
        val plen = sc.size - (4 * sc.size + 4) / 5 + 1
        sc.take(plen).zipWithIndex.map { case (e, p) => e -> (p + 1) }
          .toMap
      }
      val cands = (for {
        (ia, sa) <- docs; (ib, sb) <- docs
        if ia < ib && {
          val (pa, pb) = (prefixPos(sa), prefixPos(sb))
          val (szca, szcb) = (capped(sa).size, capped(sb).size)
          val alpha = (4 * (szca + szcb) + 8) / 9
          szcb * 5 >= szca * 4 && szca * 5 >= szcb * 4 &&
          (pa.keySet intersect pb.keySet).exists { e =>
            val (i, j) = (pa(e), pb(e))
            math.min(i, j) + math.min(szca - i, szcb - j) >= alpha
          }
        }
      } yield (ia, ib)).toSet
      val viaPrefix = cands.filter { case (ia, ib) =>
        jaccN(docs.find(_._1 == ia).get._2,
              docs.find(_._1 == ib).get._2) >= 0.8
      }
      viaPrefix == naive
    }
    check("prefix", Prop.forAll(famGen) { docs =>
      agree(docs, dfCap = Int.MaxValue) && agree(docs, dfCap = 3)
    })
  }
}
