package graft

import org.scalatest.funsuite.AnyFunSuite

/** The oracle-dtype lint as a suite gate (round-11 verdict item 2).
  *
  * DuckDB's `sum(BIGINT)` returns HUGEINT (int128) → pandas float64,
  * while Spark returns int64 — rows and schema names match but the
  * driver's representation-sensitive HASH differs. `p7_lakehouse_
  * corpus` hid exactly this class of bug for two rounds because the
  * local checker compares numerically. The repo convention (74+ call
  * sites) is to CAST every top-level aggregate in `oracleSql`; this
  * spec enforces it against the ACTUAL DuckDB result types by running
  * every oracle through `DESCRIBE` in DuckDB (tools/
  * oracle_dtype_lint.py — resolves the result type without executing,
  * so even the quadratic oracles lint in milliseconds).
  *
  * The lint needs the driver-side python3+duckdb toolchain; when that
  * is genuinely absent the test CANCELS (environment limitation, not
  * a pass) rather than failing the suite.
  */
class OracleDtypeLintSpec extends AnyFunSuite {

  test("every oracleSql resolves to driver-hashable dtypes in DuckDB (no HUGEINT/DECIMAL/unsigned)") {
    import scala.sys.process._
    val have = try {
      Seq("python3", "-c", "import duckdb").! == 0
    } catch { case _: Throwable => false }
    assume(have, "python3+duckdb unavailable — lint runs driver-side")
    // dump the live oracle map (what Verify writes as oracle_sql.json)
    val dir = java.nio.file.Files.createTempDirectory("oracle_lint")
    val json = SparkEntry.oracleSql.toSeq.sortBy(_._1).map {
      case (k, v) =>
        val esc = v.replace("\\", "\\\\").replace("\"", "\\\"")
          .replace("\n", "\\n").replace("\t", "\\t")
        s""""$k":"$esc""""
    }.mkString("{", ",", "}")
    val f = dir.resolve("oracle_sql.json")
    java.nio.file.Files.write(f, json.getBytes("UTF-8"))
    val out = new StringBuilder
    val code = Seq("python3", "tools/oracle_dtype_lint.py",
      "/root/testdata/sf0.001", f.toString)
      .!(ProcessLogger(l => { out ++= l; out += '\n' }))
    assert(code == 0, s"oracle dtype lint flagged columns:\n$out")
    assert(out.toString.contains("LINT PASS"), out.toString)
    ()
  }
}
