package graft

import java.nio.file.{Files, Path, Paths}
import graft.sources.ShardExport

class ShardExportSpec extends SparkSpec {

  private def sha(p: Path): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(Files.readAllBytes(p)).map("%02x".format(_)).mkString

  test("shard export round-trips, bounds shard size, and is byte-reproducible") {
    val out = Files.createTempDirectory("graft_shards").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val target = 16384L
    ShardExport.write(docs, out, target)

    // round-trip: every doc back, byte-identical, nothing extra
    val orig = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val back = ShardExport.readShards(spark, out)
    assert(back.size == orig.size)
    back.foreach { case (id, text, _) => assert(orig(id) == text, s"doc $id") }

    // doc_id order is monotone across the whole export: sorting by
    // doc_id must already be sorted by (shard, position)
    val byId = back.sortBy(_._1)
    assert(byId.map(_._3) == byId.map(_._3).sorted, "shard ids not monotone")

    // size bound: docs are never split, so a shard exceeds the target
    // by at most one entry
    val maxEntry = orig.values.map(t =>
      512L + ((t.getBytes("UTF-8").length + 511L) / 512L) * 512L).max
    val idx = ShardExport.readIndex(spark, out).collect()
    idx.foreach { r =>
      assert(r.getAs[Long]("payload_bytes") < target + maxEntry,
        s"shard ${r.getAs[Long]("shard_id")} overflows the bound")
    }
    assert(idx.length > 1, "target too large to exercise shard splitting")

    // index matches the parsed tars
    val counts = back.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    assert(idx.map(r =>
      r.getAs[Long]("shard_id") -> r.getAs[Long]("n_docs")).toMap == counts)
    idx.foreach { r =>
      val ids = back.filter(_._3 == r.getAs[Long]("shard_id")).map(_._1)
      assert(ids.min == r.getAs[Long]("first_doc"))
      assert(ids.max == r.getAs[Long]("last_doc"))
    }

    // reproducible: a second write produces byte-identical shards
    val out2 = Files.createTempDirectory("graft_shards2").toString
    ShardExport.write(docs, out2, target)
    val shards = Files.list(Paths.get(out)).iterator()
    shards.forEachRemaining { p =>
      if (p.getFileName.toString.endsWith(".tar"))
        assert(sha(p) == sha(Paths.get(out2, p.getFileName.toString)),
          s"${p.getFileName} not reproducible")
    }
  }

  test("shard export survives empty docs and multi-byte text") {
    import spark.implicits._
    // CJK + accented text: UTF-8 byte length ≠ char length, the
    // classic tar-size bug; plus an empty doc (header-only entry) and
    // one doc bigger than the whole shard target (gets its own shard)
    val docs = Seq(
      (1L, ""), (2L, "管道和仪表图 — schéma tuyauterie"),
      (3L, "x" * 5000), (4L, "déjà vu " * 3)
    ).toDF("doc_id", "text")
    val out = Files.createTempDirectory("graft_shards_u").toString
    graft.sources.ShardExport.write(docs, out, targetBytes = 2048)
    val back = graft.sources.ShardExport.readShards(spark, out)
    assert(back.map(t => t._1 -> t._2).toMap ==
      Map(1L -> "", 2L -> "管道和仪表图 — schéma tuyauterie",
          3L -> "x" * 5000, 4L -> "déjà vu " * 3))
    // the oversized doc pushes the NEXT doc into a later (possibly
    // non-contiguous) shard id — shard = start_off div target, so ids
    // can skip; the reader and index must both cope
    val shardOf = back.map(t => t._1 -> t._3).toMap
    assert(shardOf(4L) > shardOf(3L) + 1,
      s"doc 4 should skip shard ids past the oversized doc 3: $shardOf")
  }
}
