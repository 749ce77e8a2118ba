package graft

/** Loud, single-point guard over the driver-generated table schemas.
  *
  * The testdata is REGENERATED between rounds and its physical
  * encoding has drifted before: events.ts shipped as parquet
  * TIMESTAMP(NANOS) for six rounds, then as TIMESTAMP(MICROS)
  * without the UTC flag (Spark: TIMESTAMP_NTZ) in round 7 — which
  * surfaced as 23 scattered failures across seven suites instead of
  * one named drift. This spec pins what every operator (and every
  * DuckDB oracle) assumes AFTER the Tables loaders' normalization:
  * if the driver changes an encoding again, exactly one test fails,
  * and its diff names the column.
  */
class SchemaGuardSpec extends SparkSpec {
  private def shape(df: org.apache.spark.sql.DataFrame): Seq[(String, String)] =
    df.schema.map(f => (f.name, f.dataType.simpleString)).toSeq

  test("post-load table schemas match the operator suite's contract") {
    val expect = Map(
      "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
      "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
        "n_regionkey" -> "int"),
      "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
        "c_nationkey" -> "int", "c_acctbal" -> "double",
        "c_mktsegment" -> "string"),
      "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
        "s_nationkey" -> "int", "s_acctbal" -> "double"),
      "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
        "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
        "p_retailprice" -> "double"),
      "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
        "o_orderstatus" -> "string", "o_totalprice" -> "double",
        "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
      "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
        "l_suppkey" -> "bigint", "l_linenumber" -> "int",
        "l_quantity" -> "double", "l_extendedprice" -> "double",
        "l_discount" -> "double", "l_tax" -> "double",
        "l_returnflag" -> "string", "l_linestatus" -> "string",
        "l_shipdate" -> "timestamp_ntz"),
      // ts normalized to long epoch nanos by the loader — the events
      // operator/oracle contract (SURVEY §3)
      "events" -> Seq("event_id" -> "bigint", "ts" -> "bigint",
        "user_id" -> "bigint", "event_type" -> "string",
        "value" -> "double", "props" -> "string"),
      "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
        "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
      "embeddings" -> Seq("vec_id" -> "bigint",
        "embedding" -> "array<float>", "label" -> "int"))
    val loaders: Map[String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame] = Map(
      "region" -> (Tables.region _), "nation" -> (Tables.nation _),
      "customer" -> (Tables.customer _), "supplier" -> (Tables.supplier _),
      "part" -> (Tables.part _), "orders" -> (Tables.orders _),
      "lineitem" -> (Tables.lineitem _), "events" -> (Tables.events _),
      "documents" -> (Tables.documents _),
      "embeddings" -> (Tables.embeddings _))
    expect.foreach { case (t, want) =>
      val got = shape(loaders(t)(spark, sf))
      assert(got == want,
        s"testdata drift in `$t`:\n  got    $got\n  expect $want\n" +
          "(driver regenerated the tables with a different encoding — " +
          "normalize in graft.Tables like events.ts, then update this pin)")
    }
  }

  test("timestamp columns carry the values the oracles see") {
    // epoch(ts) in DuckDB and the normalized long nanos must describe
    // the same instants: pin one known aggregate on each
    val ev = Tables.events(spark, sf)
    val mn = ev.agg(org.apache.spark.sql.functions.min("ts")).head.getLong(0)
    // generated events live in the 2020s as epoch nanos
    assert(mn > 1.6e18 && mn < 1.9e18, s"events.ts nanos out of range: $mn")
    // orders carry TPC-H-style 1990s dates
    val od = Tables.orders(spark, sf)
      .agg(org.apache.spark.sql.functions.min("o_orderdate")).head.get(0)
    assert(od.toString.take(3) == "199" || od.toString.take(2) == "20",
      s"o_orderdate implausible: $od")
  }
}
