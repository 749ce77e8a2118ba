package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import graft.sources.{FileStats, GraftTable}
import java.nio.file.Files

/** SOUNDNESS sweep for the data-skipping evaluator — the property
  * every DML verb and pruned read stands on: whenever
  * `FileStats.mayMatch` says a file CANNOT match a predicate, that
  * file must truly contain zero matching rows. (The reverse —
  * may-match files with no matching rows — is allowed: skipping is
  * conservative.) A seeded randomized walk over typed columns
  * (long / double / string / date, with nulls) and a predicate
  * grammar (comparisons, equality, In, IsNull/IsNotNull, StartsWith,
  * And/Or) checks the implication file-by-file against Spark's own
  * filter evaluation, exactly as the DML probe consumes it.
  */
class StatsSkipPropertySpec extends SparkSpec {

  test("mayMatch=false implies the file holds zero matching rows (seeded sweep)") {
    import spark.implicits._
    val rnd = new scala.util.Random(1234)
    // a synthetic typed corpus: k (long), v (double, some nulls),
    // s (string, some nulls), d (date)
    val n = 3000
    val rows = (1 to n).map { i =>
      val k = rnd.nextInt(2000).toLong
      val v: java.lang.Double =
        if (rnd.nextInt(10) == 0) null else rnd.nextDouble() * 1000 - 500
      val s0: String =
        if (rnd.nextInt(12) == 0) null
        else ('a' + rnd.nextInt(6)).toChar.toString +
          rnd.alphanumeric.take(rnd.nextInt(8)).mkString
      val d = java.sql.Date.valueOf(
        java.time.LocalDate.of(1995, 1, 1).plusDays(rnd.nextInt(2000)))
      (k, v, s0, d)
    }
    val df = rows.toDF("k", "v", "s", "d")
    val t = GraftTable.create(spark, Files.createTempDirectory("graft_prop")
      .toString + "/t", df.repartitionByRange(6, col("k")))
    val meta = t.readCommit(1).adds
    assert(meta.size >= 4 && meta.forall(_.stats.isDefined))

    def randPred(depth: Int): Column = {
      def leaf(): Column = rnd.nextInt(9) match {
        case 0 => col("k") <= lit(rnd.nextInt(2200).toLong - 100)
        case 1 => col("k") > lit(rnd.nextInt(2200).toLong - 100)
        case 2 => col("k") === lit(rnd.nextInt(2200).toLong - 100)
        case 3 => col("v") < lit(rnd.nextDouble() * 1200 - 600)
        case 4 => col("s") >= lit(('a' + rnd.nextInt(8)).toChar.toString)
        case 5 => col("s").startsWith(('a' + rnd.nextInt(8)).toChar.toString)
        case 6 => col("k").isin((1 to 3).map(_ =>
          rnd.nextInt(2200).toLong - 100): _*)
        case 7 => if (rnd.nextBoolean()) col("v").isNull else col("s").isNotNull
        case 8 => col("d") <= lit(java.sql.Date.valueOf(
          java.time.LocalDate.of(1995, 1, 1).plusDays(rnd.nextInt(2200))))
      }
      if (depth == 0) leaf()
      else rnd.nextInt(3) match {
        case 0 => randPred(depth - 1) && randPred(depth - 1)
        case 1 => randPred(depth - 1) || randPred(depth - 1)
        case _ => leaf()
      }
    }

    var prunedSomething = 0
    (1 to 60).foreach { trial =>
      val pred = randPred(rnd.nextInt(3))
      val e = org.apache.spark.sql.graft.shim.catalystExpression(pred)
      meta.foreach { add =>
        if (!FileStats.mayMatch(add.stats, e)) {
          prunedSomething += 1
          val matches = spark.read.parquet(s"${t.root}/${add.path}")
            .filter(pred).count()
          assert(matches == 0,
            s"trial $trial UNSOUND: pruned ${add.path} but $matches rows " +
              s"match $pred (stats=${add.stats})")
        }
      }
      // whole-table sanity: the pruned-file read equals the full filter
      assert(t.readWhere(pred).count() == t.read().filter(pred).count(),
        s"trial $trial: readWhere diverged for $pred")
    }
    // the sweep must actually exercise pruning, not vacuously pass
    assert(prunedSomething > 50,
      s"sweep too weak: only $prunedSomething file-prunes across 60 trials")
  }

  test("skipping stays sound through COLUMN MAPPING (renamed predicates vs physical stats)") {
    import spark.implicits._
    // same corpus shape, but every column is RENAMED after the create:
    // predicates arrive under the new logical names while the stats
    // tokens are keyed by the original physical names — the
    // translation layer (physPred) is what this sweep pins
    val rnd = new scala.util.Random(4321)
    val rows = (1 to 2500).map { i =>
      val k = rnd.nextInt(2000).toLong
      val v: java.lang.Double =
        if (rnd.nextInt(10) == 0) null else rnd.nextDouble() * 1000 - 500
      val s0: String =
        if (rnd.nextInt(12) == 0) null
        else ('a' + rnd.nextInt(6)).toChar.toString +
          rnd.alphanumeric.take(rnd.nextInt(8)).mkString
      (k, v, s0)
    }
    val t = GraftTable.create(spark,
      Files.createTempDirectory("graft_prop_cm").toString + "/t",
      rows.toDF("k", "v", "s").repartitionByRange(6, col("k")))
    t.renameColumn("k", "kk")
    t.renameColumn("v", "vv")
    t.renameColumn("s", "ss")
    val live = t.liveFiles().map(_._1)
    def randPred(): Column = rnd.nextInt(6) match {
      case 0 => col("kk") <= lit(rnd.nextInt(2200).toLong - 100)
      case 1 => col("kk") === lit(rnd.nextInt(2200).toLong - 100)
      case 2 => col("vv") < lit(rnd.nextDouble() * 1200 - 600)
      case 3 => col("ss").startsWith(('a' + rnd.nextInt(8)).toChar.toString)
      case 4 => col("kk") > lit(rnd.nextInt(2200).toLong - 100) &&
        col("ss").isNotNull
      case 5 => col("vv").isNull || col("kk") === lit(rnd.nextInt(2000).toLong)
    }
    var pruned = 0
    (1 to 40).foreach { trial =>
      val pred = randPred()
      val survivors = t.prunedFiles(pred).toSet
      live.filterNot(p => survivors.contains(s"${t.root}/$p")).foreach { p =>
        pruned += 1
        // the file's rows, read under PHYSICAL names and projected
        // back to the renamed logical schema, must contain zero
        // matches — a UTF-16/keying/translation slip would fail here
        val matches = spark.read.parquet(s"${t.root}/$p")
          .select(col("k").as("kk"), col("v").as("vv"), col("s").as("ss"))
          .filter(pred).count()
        assert(matches == 0,
          s"trial $trial UNSOUND through mapping: pruned $p but " +
            s"$matches rows match $pred")
      }
      assert(t.readWhere(pred).count() == t.read().filter(pred).count(),
        s"trial $trial: readWhere diverged under mapping for $pred")
    }
    assert(pruned > 20, s"mapping sweep too weak: $pruned prunes")
  }
}
