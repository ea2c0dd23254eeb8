package graft.engine

import graft.SparkSpec

/** The reference's SQL-injection corpus re-expressed against the plan-level
  * gate (reference: tests/unit_tests/query_builders/test_query_builder.py:
  * 215-366 and helpers/sql_sanitizer.py:40-112): every malicious string
  * must be rejected; plain SELECT shapes must pass.
  */
class SqlGateSpec extends SparkSpec {

  private val malicious = Seq(
    "DROP TABLE users",
    "INSERT INTO t VALUES (1)",
    "UPDATE t SET a = 1",
    "DELETE FROM t",
    "SELECT * FROM t; DROP TABLE t",
    "SELECT * FROM t WHERE 1=1; TRUNCATE TABLE t",
    "CREATE TABLE x AS SELECT 1",
    "SELECT * FROM t -- hidden comment",
    "SELECT * FROM t /* block */",
    "GRANT ALL ON t TO PUBLIC",
    "SELECT * FROM (SELECT * FROM t; DELETE FROM t) sub",
    "EXPLAIN SELECT 1",
    "SHOW TABLES",
    "SET spark.sql.shuffle.partitions=1",
  )

  private val benign = Seq(
    "SELECT 1",
    "SELECT a, b FROM t WHERE a > 1 ORDER BY b LIMIT 5",
    "SELECT count(*) FROM t GROUP BY a HAVING count(*) > 1",
    "WITH c AS (SELECT 1 AS x) SELECT * FROM c",
    "SELECT * FROM a JOIN b ON a.id = b.id",
    "SELECT rank() OVER (PARTITION BY a ORDER BY b) FROM t",
  )

  test("malicious statements are rejected") {
    malicious.foreach { q =>
      assert(!SqlGate.isSqlQuerySafe(spark, q), s"should reject: $q")
    }
  }

  test("benign SELECT shapes pass") {
    benign.foreach { q =>
      assert(SqlGate.isSqlQuerySafe(spark, q), s"should accept: $q")
    }
  }

  test("table whitelist rejects unknown relations, tolerates CTE names") {
    val known = Set("orders", "customer")
    SqlGate.checkTables(spark, "SELECT * FROM orders", known)
    SqlGate.checkTables(spark,
      "WITH t AS (SELECT * FROM orders) SELECT * FROM t JOIN customer ON true", known)
    intercept[SqlGate.MaliciousQueryError] {
      SqlGate.checkTables(spark, "SELECT * FROM secret", known)
    }
    intercept[SqlGate.MaliciousQueryError] {
      SqlGate.checkTables(spark, "SELECT * FROM orders JOIN leak ON true", known)
    }
  }

  test("whitelist sees through expression subqueries (EXISTS/IN/scalar)") {
    val known = Set("orders")
    Seq(
      "SELECT 1 FROM orders WHERE EXISTS (SELECT 1 FROM secret)",
      "SELECT 1 FROM orders WHERE o_custkey IN (SELECT id FROM secret)",
      "SELECT (SELECT max(x) FROM secret) FROM orders",
    ).foreach { q =>
      intercept[SqlGate.MaliciousQueryError](SqlGate.checkTables(spark, q, known))
    }
    // legitimate subqueries over known tables pass
    SqlGate.checkTables(spark,
      "SELECT 1 FROM orders WHERE o_custkey IN (SELECT o_custkey FROM orders)", known)
  }

  test("inner CTE cannot shadow-exempt an outer real table; qualified names rejected") {
    val known = Set("orders")
    intercept[SqlGate.MaliciousQueryError] {
      SqlGate.checkTables(spark,
        "SELECT * FROM secret JOIN (WITH secret AS (SELECT 1 AS a) SELECT * FROM secret) x ON true",
        known)
    }
    // db-qualified refs resolve to catalog tables, never temp views
    intercept[SqlGate.MaliciousQueryError] {
      SqlGate.checkTables(spark, "SELECT * FROM default.orders", known)
    }
  }

  test("CTE scope is declaration-ordered: no self-reference, no forward reference") {
    val known = Set("orders")
    // self-reference: the inner `t` is NOT the CTE (Spark CTEs are not
    // recursive) — it must hit the whitelist and be rejected
    intercept[SqlGate.MaliciousQueryError] {
      SqlGate.checkTables(spark, "WITH t AS (SELECT * FROM t) SELECT * FROM t", known)
    }
    // forward reference: `b` is declared after `a`, so `a`'s body must
    // not see it
    intercept[SqlGate.MaliciousQueryError] {
      SqlGate.checkTables(spark,
        "WITH a AS (SELECT * FROM b), b AS (SELECT 1 AS x) SELECT * FROM a", known)
    }
    // backward reference is legitimate and passes
    SqlGate.checkTables(spark,
      "WITH a AS (SELECT o_orderkey FROM orders), b AS (SELECT * FROM a) SELECT * FROM b",
      known)
    // self-reference to a KNOWN table inside its same-named CTE also passes
    // (resolves to the real table, which is whitelisted)
    SqlGate.checkTables(spark,
      "WITH orders AS (SELECT * FROM orders) SELECT * FROM orders", known)
  }

  test("quoteIdentifier renders injection attempts inert in spark.sql") {
    import spark.implicits._
    Seq((1, "x")).toDF("id", "weird name").createOrReplaceTempView("qi_test")
    // an injection-shaped column name stays a (missing-column) identifier,
    // never executable SQL
    val quoted = SqlGate.quoteIdentifier("weird name")
    assert(spark.sql(s"SELECT $quoted FROM qi_test").count() == 1)
    val evil = SqlGate.quoteIdentifier("a`; DROP TABLE qi_test; --")
    val err = intercept[Exception](spark.sql(s"SELECT $evil FROM qi_test").collect())
    assert(err.getMessage.toLowerCase.contains("cannot be resolved")
      || err.getMessage.contains("UNRESOLVED_COLUMN"))
    assert(spark.catalog.tableExists("qi_test"))
  }

  test("name sanitizers (sql_sanitizer.py:9-37)") {
    assert(SqlGate.sanitizeTableName("my table!") == "my_table_")
    assert(SqlGate.sanitizeTableName("a" * 100) == "a" * 64)
    assert(SqlGate.sanitizeTableNameLowercase("MiXeD-Case") == "mixed_case")
    assert(SqlGate.sanitizeFileName("/data/Sales Report.csv") == "sales_report")
  }
}
