package graft

import org.apache.spark.sql.functions._
import graft.sources.CompactFiles
import java.nio.file.{Files, Paths}

class CompactionSpec extends SparkSpec {

  test("compaction merges undersized files, moves compliant ones untouched") {
    val dir = Files.createTempDirectory("graft_compact_src").toString
    val out = Files.createTempDirectory("graft_compact_out").toString + "/o"
    // a fragmented landing: 12 tiny part files (a micro-batch sink's
    // accretion pattern) + one comfortably-sized file
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey",
      "l_quantity", "l_shipdate")
    li.filter(col("l_orderkey") % 4 === 0).repartition(12)
      .write.mode("overwrite").parquet(dir)
    val bigStage = Files.createTempDirectory("graft_compact_big").toString
    li.filter(col("l_orderkey") % 4 =!= 0).coalesce(1)
      .write.mode("overwrite").parquet(bigStage)
    val bigPart = new java.io.File(bigStage).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val bigDest = Paths.get(dir, "big-0000.parquet")
    Files.move(bigPart.toPath, bigDest)
    def partFiles(d: String) = new java.io.File(d).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).sortBy(_.getName)
    val smalls = partFiles(dir).filter(_.getName != "big-0000.parquet")
    val bigLen = bigDest.toFile.length
    // target: the big file is compliant (>= target/2), the 12 are not
    val target = bigLen * 2
    assert(smalls.forall(_.length < target / 2),
      "fixture broken: a 'small' file is compliant at this target")

    val m = CompactFiles.compact(spark, dir, out, target).head
    // content preserved exactly
    val before = li.collect().map(_.toSeq).groupBy(identity).view
      .mapValues(_.length).toMap
    val after = spark.read.parquet(out).collect().map(_.toSeq)
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(after == before, "compaction changed the row multiset")
    // the compliant file was moved byte-identically, never rewritten
    val keptBytes = Files.readAllBytes(Paths.get(out, "big-0000.parquet"))
    assert(java.util.Arrays.equals(keptBytes, Files.readAllBytes(bigDest)),
      "compliant file was rewritten — must be moved byte-identically")
    // the 12 undersized files collapsed into ceil(smallBytes/target)
    val expectOut = math.max(1L,
      (smalls.map(_.length).sum + target - 1) / target).toInt
    val outParts = partFiles(out)
    assert(outParts.length == 1 + expectOut,
      s"got ${outParts.length} files, want 1 kept + $expectOut compacted")
    // self-describing manifest matches what happened
    assert(m.getAs[Long]("files_in") == 13 &&
      m.getAs[Long]("files_kept") == 1 &&
      m.getAs[Long]("files_rewritten_in") == 12 &&
      m.getAs[Long]("files_rewritten_out") == expectOut.toLong)
    val read = CompactFiles.readManifest(spark, out).head
    assert(read.getAs[Long]("files_in") == 13)
    // the _compaction manifest dir must not leak into table reads
    assert(spark.read.parquet(out).columns.toSeq ==
      Seq("l_orderkey", "l_partkey", "l_quantity", "l_shipdate"))
  }

  test("re-compacting a prior compaction output loses nothing") {
    // the repeated-OPTIMIZE loop this class is built for: round 2's
    // input contains round 1's compacted-* output as a compliant file
    // next to freshly-accreted small files. Rewritten names carry a
    // run id so they can never silently overwrite the carried file.
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val d1 = Files.createTempDirectory("graft_recompact_1").toString
    li.filter(col("l_orderkey") % 2 === 0).repartition(8)
      .write.mode("overwrite").parquet(d1)
    val o1 = Files.createTempDirectory("graft_recompact_o1").toString + "/o"
    CompactFiles.compact(spark, d1, o1, targetBytes = 64L * 1024 * 1024)
    // simulate the worst case from the bug report: the carried-over
    // compliant file bears the legacy fixed name compacted-00000.parquet
    val d2 = Files.createTempDirectory("graft_recompact_2").toString
    val prior = new java.io.File(o1).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    prior.zipWithIndex.foreach { case (f, i) =>
      Files.copy(f.toPath, Paths.get(d2, f"compacted-$i%05d.parquet"))
    }
    val freshDir = Files.createTempDirectory("graft_recompact_fresh").toString
    li.filter(col("l_orderkey") % 2 =!= 0).repartition(6)
      .write.mode("overwrite").parquet(freshDir)
    new java.io.File(freshDir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .foreach(f => Files.copy(f.toPath, Paths.get(d2, f.getName)))
    // target chosen so the prior output is compliant, fresh files are not
    val priorLen = new java.io.File(d2).listFiles()
      .filter(_.getName.startsWith("compacted-")).map(_.length).max
    val o2 = Files.createTempDirectory("graft_recompact_o2").toString + "/o"
    CompactFiles.compact(spark, d2, o2, targetBytes = priorLen * 2)
    val before = li.collect().map(_.toSeq).groupBy(identity).view
      .mapValues(_.length).toMap
    val after = spark.read.parquet(o2).collect().map(_.toSeq)
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(after == before,
      "re-compaction over a prior compacted-* output changed the row multiset")
  }

  test("compacting a streamed sink's accretion preserves the stream result") {
    // the operational loop compaction exists for: a micro-batch file
    // sink accretes small part files; OPTIMIZE rewrites the layout,
    // never the table
    val base = Files.createTempDirectory("graft_compact_stream")
    val streamed = graft.streaming.EventStream.streamDedupToParquet(
      spark, sf, s"$base/out", s"$base/ckpt")
    val nFilesBefore = new java.io.File(s"$base/out").listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    val m = CompactFiles.compact(spark, s"$base/out", s"$base/opt",
      targetBytes = 64L * 1024 * 1024).head
    val compacted = spark.read.parquet(s"$base/opt")
    assert(compacted.count() == streamed.count(),
      "compaction changed the streamed table's row count")
    val nFilesAfter = new java.io.File(s"$base/opt").listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(nFilesAfter <= nFilesBefore,
      s"compaction grew the file count: $nFilesBefore -> $nFilesAfter")
    assert(m.getAs[Long]("files_in") == nFilesBefore.toLong)
  }
}
