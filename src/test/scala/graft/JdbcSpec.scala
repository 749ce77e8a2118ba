package graft

import org.apache.spark.sql.functions._
import graft.sources.Readers

/** JDBC passthrough against Derby embedded (the JDBC database Spark
  * ships). Derby folds unquoted identifiers to uppercase, hence the
  * O_* column names on readback.
  */
class JdbcSpec extends SparkSpec {

  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"
  private lazy val url = {
    val dir = java.nio.file.Files.createTempDirectory("graft_derby")
    s"jdbc:derby:$dir/db;create=true"
  }

  test("jdbc write/read round-trips through Derby") {
    val src = Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    Readers.writeJdbc(src, url, "orders_rt", driver)
    val back = Readers.jdbc(spark, url, "orders_rt", driver)
    assert(back.count() == src.count())
    assert(back.agg(sum(col("O_ORDERKEY"))).head.getLong(0) ==
           src.agg(sum(col("o_orderkey"))).head.getLong(0))
  }

  test("jdbc filters push into the remote SQL") {
    val back = Readers.jdbc(spark, url, "orders_rt", driver)
      .filter(col("O_ORDERKEY") < 100)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThan"),
      s"filter not pushed to JDBC source:\n$plan")
  }

  test("partitioned jdbc read fans out over range-bounded connections") {
    val src = Tables.orders(spark, sf)
    val bounds = src.agg(min("o_orderkey"), max("o_orderkey")).head
    val back = Readers.jdbcPartitioned(spark, url, "orders_rt", driver,
      "O_ORDERKEY", bounds.getLong(0), bounds.getLong(1), numPartitions = 4)
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == src.count())
  }

  test("warehouse dialect translation: the GetData shape compiles per engine") {
    // the reference speaks Snowflake/SQL-Server (app.py:1209-1292);
    // its hottest read is GetData's ILIKE search + ORDER + LIMIT/
    // OFFSET page (app.py:5029-5078). No warehouse driver ships in
    // this environment, so the assertion targets the exact SQL Spark
    // would send: the dialect registry resolves per-URL, and the
    // pushed (CONTAINS, IS_NOT_NULL, sort, limit, offset) plan
    // compiles through each dialect's own query builder — the
    // translation layer a user hits first when pointing this at the
    // reference's warehouse. Derby's round-trip specs above cover
    // the live-connection half.
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    import org.apache.spark.sql.execution.datasources.jdbc.{JDBCOptions, JDBCPartition}
    import org.apache.spark.sql.jdbc.JdbcDialects
    import org.apache.spark.unsafe.types.UTF8String
    def compile(url: String): String = {
      val dialect = JdbcDialects.get(url)
      val opts = new JDBCOptions(Map("url" -> url, "dbtable" -> "registry",
        "driver" -> "org.apache.derby.iapi.jdbc.AutoloadedDriver"))
      val contains = new Predicate("CONTAINS", Array(
        Expressions.column("tag_no"),
        Expressions.literal(UTF8String.fromString("PIPE"))))
      val notNull = new Predicate("IS_NOT_NULL",
        Array(Expressions.column("status")))
      dialect.getJdbcSQLQueryBuilder(opts)
        .withColumns(Array(dialect.quoteIdentifier("tag_no"),
          dialect.quoteIdentifier("description")))
        .withPredicates(Array(contains, notNull), JDBCPartition(null, 0))
        .withSortOrders(Array(dialect.quoteIdentifier("tag_no") + " ASC"))
        .withLimit(20).withOffset(100)
        .build().trim.replaceAll("\\s+", " ")
    }
    val mssql = compile("jdbc:sqlserver://h;database=d")
    // T-SQL: TOP(n) instead of LIMIT, and the OFFSET is NOT pushed
    // (this builder shape has no ORDER-less OFFSET/FETCH form) — a
    // naive "LIMIT 20 OFFSET 100" would be a syntax error server-side
    assert(mssql.startsWith("SELECT TOP (20) "), mssql)
    assert(!mssql.contains("LIMIT") && !mssql.contains("OFFSET"), mssql)
    assert(mssql.contains("\"tag_no\" LIKE '%PIPE%' ESCAPE '\\'"), mssql)
    assert(mssql.contains("\"status\" IS NOT NULL"), mssql)
    assert(mssql.contains("ORDER BY \"tag_no\" ASC"), mssql)
    val pg = compile("jdbc:postgresql://h/d")
    assert(pg.endsWith("ORDER BY \"tag_no\" ASC LIMIT 20 OFFSET 100"), pg)
    val mysql = compile("jdbc:mysql://h/d")
    // MySQL: backtick quoting, double-escaped LIKE escape, and the
    // comma OFFSET form (LIMIT offset, count)
    assert(mysql.contains("`tag_no` LIKE '%PIPE%' ESCAPE '\\\\'"), mysql)
    assert(mysql.endsWith("ORDER BY `tag_no` ASC LIMIT 100, 20"), mysql)
    ()
  }
}
