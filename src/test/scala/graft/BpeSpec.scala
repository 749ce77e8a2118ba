package graft

import graft.operators.TextOps

/** Pins the batched-BPE selection rule (d33BpeTrainBatched) to the
  * serial greedy trainer it replaces: the disjoint-prefix + strict-gap
  * batch is PROVABLY the same merge sequence, and these cases check
  * the proof's conclusion bit-for-bit on the real corpus — merge
  * order, symbols, and recorded counts all identical.
  */
class BpeSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("merge_round"),
      r.getAs[String]("left_sym"), r.getAs[String]("right_sym"),
      r.getAs[String]("merged"), r.getAs[Long]("n"))).toSeq

  private lazy val serial = rows(TextOps.d33BpeTrain(spark, sf, rounds = 8))

  test("batched P=1 equals serial greedy bit-for-bit") {
    val got = rows(TextOps.d33BpeTrainBatched(spark, sf, rounds = 8,
      batchP = 1))
    assert(got == serial, s"P=1 diverged from serial:\n$got\nvs\n$serial")
  }

  test("batched P=4 equals serial greedy bit-for-bit, with real batching") {
    val trace = scala.collection.mutable.Buffer.empty[Int]
    val got = rows(TextOps.d33BpeTrainBatched(spark, sf, rounds = 8,
      batchP = 4, batchTrace = trace))
    assert(got == serial, s"P=4 diverged from serial:\n$got\nvs\n$serial")
    assert(trace.sum == 8, s"trace doesn't cover all merges: $trace")
    assert(trace.size < 8,
      s"no batching happened (8 driver rounds for 8 merges): $trace")
  }

  test("longer training stays self-consistent across batch widths") {
    // no serial baseline needed: two independent widths must agree
    // with each other on a longer merge sequence (equivalence is
    // transitive through the serial order both are proven equal to)
    val a = rows(TextOps.d33BpeTrainBatched(spark, sf, rounds = 16,
      batchP = 2))
    val b = rows(TextOps.d33BpeTrainBatched(spark, sf, rounds = 16,
      batchP = 6))
    assert(a == b, s"P=2 and P=6 diverged at 16 merges")
    assert(a.size == 16)
  }
}
