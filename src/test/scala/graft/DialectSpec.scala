package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.connector.expressions.{Expression, Expressions}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects}
import org.apache.spark.unsafe.types.UTF8String

/** JDBC dialect matrix (VERDICT r9 #4): the reference's extract/load
  * arrows are MySQL (README.md:9,13-19) and Redshift — which speaks the
  * PostgreSQL wire protocol — (README.md:23,65-72), but the sandbox has
  * no network and only the Derby driver, so `scan_jdbc_export` /
  * `sink_jdbc_load` run live against Derby alone. What DIFFERS per
  * engine is not the scan plumbing (same `spark.read.jdbc` path) but the
  * SQL text Spark generates: identifier quoting, literal escaping, and
  * LIMIT support all come from the `JdbcDialect` selected by URL. This
  * spec pins those per-dialect outputs WITHOUT a live connection, so a
  * user pointing the ingest at MySQL/Redshift exercises exactly the SQL
  * shapes asserted here.
  *
  * All assertions are against the public `JdbcDialects` registry —
  * byte-exact expected strings captured from Spark 4.1.2.
  */
class DialectSpec extends AnyFunSuite {

  private val mysql = JdbcDialects.get("jdbc:mysql://host:3306/etl")
  private val pg = JdbcDialects.get("jdbc:postgresql://host:5439/dw")
  private val derby = JdbcDialects.get("jdbc:derby:memory:graft")

  test("url -> dialect resolution covers the reference's engines") {
    assert(mysql.getClass.getSimpleName.startsWith("MySQLDialect"))
    assert(pg.getClass.getSimpleName.startsWith("PostgresDialect"))
    assert(derby.getClass.getSimpleName.startsWith("DerbyDialect"))
  }

  test("identifier quoting: backticks on MySQL, double quotes elsewhere") {
    assert(mysql.quoteIdentifier("o_orderkey") == "`o_orderkey`")
    assert(pg.quoteIdentifier("o_orderkey") == "\"o_orderkey\"")
    assert(derby.quoteIdentifier("o_orderkey") == "\"o_orderkey\"")
  }

  // The V2 pushdown path: Spark compiles catalyst predicates to connector
  // Predicates, then the dialect renders SQL. These are the WHERE texts
  // that reach the remote engine for filter_* pushed through a JDBC scan.
  private def compiled(d: JdbcDialect, p: Predicate): String =
    d.compileExpression(p).getOrElse(fail(s"dialect refused predicate $p"))

  private val comparisonAnd = new Predicate("AND",
    Array[Expression](
      new Predicate(">", Array[Expression](
        Expressions.column("o_totalprice"), Expressions.literal(1000.0d))),
      new Predicate("=", Array[Expression](
        Expressions.column("o_orderstatus"),
        Expressions.literal(UTF8String.fromString("F"))))))

  test("pushed predicate SQL: comparison + AND per dialect") {
    assert(compiled(mysql, comparisonAnd) ==
      "(`o_totalprice` > 1000.0) AND (`o_orderstatus` = 'F')")
    assert(compiled(pg, comparisonAnd) ==
      "(\"o_totalprice\" > 1000.0) AND (\"o_orderstatus\" = 'F')")
    assert(compiled(derby, comparisonAnd) ==
      "(\"o_totalprice\" > 1000.0) AND (\"o_orderstatus\" = 'F')")
  }

  test("pushed predicate SQL: IS NOT NULL and IN per dialect") {
    val notNull = new Predicate("IS_NOT_NULL",
      Array[Expression](Expressions.column("o_orderdate")))
    val in = new Predicate("IN", Array[Expression](
      Expressions.column("o_orderstatus"),
      Expressions.literal(UTF8String.fromString("F")),
      Expressions.literal(UTF8String.fromString("O"))))
    assert(compiled(mysql, notNull) == "`o_orderdate` IS NOT NULL")
    assert(compiled(pg, notNull) == "\"o_orderdate\" IS NOT NULL")
    assert(compiled(mysql, in) == "`o_orderstatus` IN ('F', 'O')")
    assert(compiled(derby, in) == "\"o_orderstatus\" IN ('F', 'O')")
  }

  test("literal rendering: quote doubling and temporal formats (V1 filter path)") {
    // compileValue is the V1 path used by both pushed Filters and the
    // partitioned-read boundary literals. The quote-doubling is what
    // keeps a value like O'Brien from truncating the remote WHERE.
    for (d <- Seq(mysql, pg, derby)) {
      assert(d.compileValue("O'Brien") == "'O''Brien'")
      assert(d.compileValue(java.sql.Date.valueOf("2001-05-01")) == "'2001-05-01'")
      assert(d.compileValue(java.sql.Timestamp.valueOf("2001-05-01 10:30:00")) ==
        "'2001-05-01 10:30:00.0'")
    }
  }

  test("LIMIT clause: supported on MySQL/Postgres, absent on Derby") {
    assert(mysql.supportsLimit && mysql.getLimitClause(100) == "LIMIT 100")
    assert(pg.supportsLimit && pg.getLimitClause(100) == "LIMIT 100")
    // Derby has no LIMIT syntax — a pushed limit must NOT be generated,
    // or every Derby read with a head() would throw remotely.
    assert(!derby.supportsLimit && derby.getLimitClause(100) == "")
  }

  test("partitioned-read SELECT per dialect (the scan_jdbc_export shape)") {
    import org.apache.spark.sql.execution.datasources.jdbc.{JDBCOptions, JDBCPartition}
    // JDBCOptions insists the driver class for the URL is loadable; only
    // Derby's is shipped, so it is pinned for ALL urls — the builder
    // under test never opens a connection, and the dialect is supplied
    // explicitly, so the driver choice is inert scaffolding here.
    def selectFor(d: JdbcDialect, url: String): String = {
      val opts = new JDBCOptions(Map("url" -> url, "dbtable" -> "orders",
        "driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
      // the partition WHERE exactly as JDBCRelation.columnPartition
      // builds it: quoted column, compileValue'd stride boundaries
      val c = d.quoteIdentifier("o_orderdate")
      val lo = d.compileValue(java.sql.Date.valueOf("2001-01-01"))
      val hi = d.compileValue(java.sql.Date.valueOf("2001-05-01"))
      val part = JDBCPartition(s"$c >= $lo AND $c < $hi", 0)
      val pred = new Predicate(">", Array[Expression](
        Expressions.column("o_totalprice"), Expressions.literal(1000.0d)))
      d.getJdbcSQLQueryBuilder(opts)
        .withColumns(Array(d.quoteIdentifier("o_orderkey"),
          d.quoteIdentifier("o_totalprice")))
        .withPredicates(Array(pred), part)
        .withLimit(100)
        .build()
        .replaceAll("\\s+", " ").trim
    }
    assert(selectFor(mysql, "jdbc:mysql://host:3306/etl") ==
      "SELECT `o_orderkey`,`o_totalprice` FROM orders " +
        "WHERE ((`o_totalprice` > 1000.0)) " +
        "AND (`o_orderdate` >= '2001-01-01' AND `o_orderdate` < '2001-05-01') LIMIT 100")
    assert(selectFor(pg, "jdbc:postgresql://host:5439/dw") ==
      "SELECT \"o_orderkey\",\"o_totalprice\" FROM orders " +
        "WHERE ((\"o_totalprice\" > 1000.0)) " +
        "AND (\"o_orderdate\" >= '2001-01-01' AND \"o_orderdate\" < '2001-05-01') LIMIT 100")
    // Derby: same WHERE, but the pushed LIMIT is silently dropped
    // (supportsLimit=false) — asserted so an upgrade that starts
    // emitting LIMIT against Derby fails here before failing remotely.
    assert(selectFor(derby, "jdbc:derby:memory:graft") ==
      "SELECT \"o_orderkey\",\"o_totalprice\" FROM orders " +
        "WHERE ((\"o_totalprice\" > 1000.0)) " +
        "AND (\"o_orderdate\" >= '2001-01-01' AND \"o_orderdate\" < '2001-05-01')")
  }
}
