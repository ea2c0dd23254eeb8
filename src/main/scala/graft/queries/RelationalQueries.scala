package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.engine.{Paginator, SqlGate}
import graft.queries.QueryDef._

/** SURVEY §2.2 relational core (R1–R17) + §2.3 SQL-infrastructure ops
  * (Q4–Q6, U2). Every entry has a DuckDB oracle.
  *
  * Plans are built with the DataFrame API (L1 shape) or `spark.sql` (L2
  * surface). Dimension tables (nation/region) are explicitly
  * `broadcast()`-hinted in join queries; fact-fact joins shuffle on their
  * keys and rely on AQE at scale.
  */
object RelationalQueries {

  def defs: Seq[QueryDef] = Seq(

    // R1 — projection of declared columns
    QueryDef("r01_projection",
      (s, dir) => Tables.load(s, dir, "region")
        .select("r_regionkey", "r_name")
        .orderBy("r_regionkey"),
      Some("SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey")),

    // R2 — arbitrary scalar expression per column (per-row double math is
    // bit-identical across engines; no rounding needed)
    QueryDef("r02_expression",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          (col("l_quantity") * col("l_tax")).as("qty_tax"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
              l_extendedprice * (1 - l_discount) AS revenue,
              l_quantity * l_tax AS qty_tax
              FROM lineitem ORDER BY l_orderkey, l_linenumber""")),

    // R3 — alias / rename
    QueryDef("r03_alias",
      (s, dir) => Tables.load(s, dir, "nation")
        .select(col("n_nationkey").as("id"), col("n_name").as("nation"),
          col("n_regionkey").as("region_id"))
        .orderBy("id"),
      Some("SELECT n_nationkey AS id, n_name AS nation, n_regionkey AS region_id FROM nation ORDER BY id")),

    // R4 — filter: range + equality + ILIKE predicates
    QueryDef("r04_filter",
      (s, dir) => Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1997-01-01") &&
          col("o_orderpriority").ilike("%urgent%"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
              WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'
                AND o_orderpriority ILIKE '%urgent%'
              ORDER BY o_orderkey""")),

    // R6 — inner equi join (fact-fact: shuffles on the key, AQE planned)
    QueryDef("r06_join_inner",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .join(Tables.load(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"), "inner")
        .filter(col("o_orderstatus") === "F")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("o_custkey"), col("l_quantity"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, o_custkey, l_quantity
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              WHERE o_orderstatus = 'F' ORDER BY l_orderkey, l_linenumber""")),

    // R6 — left outer join (kept-rows side semantics)
    QueryDef("r06_join_left",
      (s, dir) => {
        val bigOrders = Tables.load(s, dir, "orders")
          .filter(col("o_totalprice") > 450000)
        Tables.load(s, dir, "customer")
          .join(bigOrders, col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("n_big_orders"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, COUNT(o_orderkey) AS n_big_orders
              FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 450000) o
                ON c_custkey = o_custkey
              GROUP BY c_custkey ORDER BY c_custkey""")),

    // R6 — right outer join
    QueryDef("r06_join_right",
      (s, dir) => Tables.load(s, dir, "orders")
        .filter(col("o_totalprice") > 450000)
        .join(Tables.load(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"), "right")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_big_orders"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, COUNT(o_orderkey) AS n_big_orders
              FROM (SELECT * FROM orders WHERE o_totalprice > 450000) o
                RIGHT JOIN customer ON o_custkey = c_custkey
              GROUP BY c_custkey ORDER BY c_custkey""")),

    // R6 — full outer join of two aggregates
    QueryDef("r06_join_full",
      (s, dir) => {
        val custPerNation = Tables.load(s, dir, "customer")
          .groupBy(col("c_nationkey").as("nationkey"))
          .agg(count(lit(1)).as("n_customers"))
        val suppPerNation = Tables.load(s, dir, "supplier")
          .filter(col("s_acctbal") > 5000)
          .groupBy(col("s_nationkey").as("s_nk"))
          .agg(count(lit(1)).as("n_suppliers"))
        custPerNation.join(suppPerNation,
            col("nationkey") === col("s_nk"), "full")
          .select(coalesce(col("nationkey"), col("s_nk")).as("nationkey"),
            col("n_customers"), col("n_suppliers"))
          .orderBy("nationkey")
      },
      Some("""SELECT COALESCE(c.nationkey, s.s_nk) AS nationkey, n_customers, n_suppliers
              FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers FROM customer GROUP BY 1) c
              FULL JOIN (SELECT s_nationkey AS s_nk, COUNT(*) AS n_suppliers FROM supplier WHERE s_acctbal > 5000 GROUP BY 1) s
                ON c.nationkey = s.s_nk
              ORDER BY nationkey""")),

    // R6 — left semi join (EXISTS)
    QueryDef("r06_join_semi",
      (s, dir) => Tables.load(s, dir, "customer")
        .join(Tables.load(s, dir, "orders").filter(col("o_totalprice") > 450000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
              WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 450000)
              ORDER BY c_custkey""")),

    // R6 — left anti join (NOT EXISTS)
    QueryDef("r06_join_anti",
      (s, dir) => Tables.load(s, dir, "customer")
        .join(Tables.load(s, dir, "orders").filter(col("o_totalprice") > 450000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
              WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 450000)
              ORDER BY c_custkey""")),

    // R6 — cross join (both sides tiny by construction)
    QueryDef("r06_join_cross",
      (s, dir) => Tables.load(s, dir, "region")
        .crossJoin(Tables.load(s, dir, "orders")
          .select(col("o_orderstatus")).distinct())
        .select("r_name", "o_orderstatus")
        .orderBy("r_name", "o_orderstatus"),
      Some("""SELECT r_name, o_orderstatus
              FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) o
              ORDER BY r_name, o_orderstatus""")),

    // R7/R8 — TPC-H Q1-shaped group-by aggregation (decimal-exact sums)
    QueryDef("r07_groupby_agg",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some(s"""SELECT l_returnflag, l_linestatus,
               ${dsumSql("l_quantity")} AS sum_qty,
               ${dsumSql("l_extendedprice")} AS sum_base_price,
               ${davgSql("l_quantity")} AS avg_qty,
               ${davgSql("l_discount")} AS avg_disc,
               COUNT(*) AS count_order
               FROM lineitem WHERE l_shipdate <= '1998-09-02'
               GROUP BY l_returnflag, l_linestatus
               ORDER BY l_returnflag, l_linestatus""")),

    // R7 — ROLLUP: hierarchical subtotals (NULLS FIRST pinned — Spark's
    // asc default — since rollup emits NULL group keys)
    QueryDef("r07_rollup",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc, col("l_linestatus").asc),
      Some(s"""SELECT l_returnflag, l_linestatus,
               ${dsumSql("l_quantity")} AS sum_qty, COUNT(*) AS n
               FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
               ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    // R7 — CUBE (all grouping combinations)
    QueryDef("r07_cube",
      (s, dir) => Tables.load(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc, col("o_orderpriority").asc),
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
              FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
              ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")),

    // R7 — GROUPING SETS (same ANSI text on both engines)
    QueryDef("r07_grouping_sets", (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(GROUPING_SETS_SQL)
    }, Some(GROUPING_SETS_SQL)),

    // R7 — HAVING (post-aggregation filter)
    QueryDef("r07_having",
      (s, dir) => Tables.load(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("spend"))
        .filter(col("n_orders") >= 15)
        .orderBy("o_custkey"),
      Some(s"""SELECT o_custkey, COUNT(*) AS n_orders,
               ${dsumSql("o_totalprice")} AS spend
               FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
               ORDER BY o_custkey""")),

    // R15 — IN-subquery + scalar subquery (same ANSI text on both engines)
    QueryDef("r15_subquery", (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(SUBQUERY_SQL)
    }, Some(SUBQUERY_SQL)),

    // R16 — second window surface: dense_rank / ntile / first_value
    QueryDef("r16_window_rank", (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(WINDOW_RANK_SQL)
    }, Some(WINDOW_RANK_SQL)),

    // R8 — aggregate-function surface: count / count distinct / min / max /
    // deterministic stddev
    QueryDef("r08_agg_functions",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          dstddev(col("l_quantity")).as("stddev_qty"))
        .orderBy("l_returnflag"),
      Some(s"""SELECT l_returnflag, COUNT(*) AS n_rows,
               COUNT(DISTINCT l_orderkey) AS n_orders,
               MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
               ${dstddevSql("l_quantity")} AS stddev_qty
               FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // R8 — exact interpolated percentiles (Spark `percentile` and DuckDB
    // `quantile_cont` share the linear-interpolation definition)
    QueryDef("r08_percentile",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.9)").as("p90"),
          expr("percentile(l_extendedprice, 0.25)").as("price_p25"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
              quantile_cont(l_quantity, 0.5) AS p50,
              quantile_cont(l_quantity, 0.9) AS p90,
              quantile_cont(l_extendedprice, 0.25) AS price_p25
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // L2 grammar — datetime scalar surface (dayofweek differs between
    // engines; pinned to Monday=0 via weekday/isodow)
    QueryDef("l2_datetime_funcs",
      (s, dir) => Tables.load(s, dir, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          quarter(col("o_orderdate")).as("q"),
          weekday(col("o_orderdate")).as("dow_mon0"),
          date_add(col("o_orderdate"), 30).as("plus30"),
          datediff(lit("2002-01-01"), col("o_orderdate")).as("days_to_2002"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
              CAST(year(o_orderdate) AS INT) AS y,
              CAST(month(o_orderdate) AS INT) AS m,
              CAST(day(o_orderdate) AS INT) AS d,
              CAST(quarter(o_orderdate) AS INT) AS q,
              CAST(isodow(o_orderdate) - 1 AS INT) AS dow_mon0,
              CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30,
              CAST(datediff('day', o_orderdate, TIMESTAMP '2002-01-01') AS INT) AS days_to_2002
              FROM orders ORDER BY o_orderkey""")),

    // L2 grammar — string scalar surface
    QueryDef("l2_string_funcs",
      (s, dir) => Tables.load(s, dir, "part")
        .select(col("p_partkey"),
          concat_ws("|", col("p_brand"), col("p_type")).as("tag"),
          substring(col("p_name"), 2, 4).as("mid"),
          instr(col("p_name"), "e").as("first_e"),
          translate(col("p_name"), "aeiou", "AEIOU").as("shouty"),
          reverse(col("p_name")).as("backwards"),
          length(col("p_name")).as("name_len"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
              concat_ws('|', p_brand, p_type) AS tag,
              substring(p_name, 2, 4) AS mid,
              CAST(strpos(p_name, 'e') AS INT) AS first_e,
              translate(p_name, 'aeiou', 'AEIOU') AS shouty,
              reverse(p_name) AS backwards,
              CAST(length(p_name) AS INT) AS name_len
              FROM part ORDER BY p_partkey""")),

    // R9 — distinct
    QueryDef("r09_distinct",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
              ORDER BY l_returnflag, l_linestatus""")),

    // R10 — multi-key sort with mixed directions
    QueryDef("r10_sort",
      (s, dir) => Tables.load(s, dir, "part")
        .select("p_partkey", "p_brand", "p_retailprice")
        .orderBy(col("p_brand").asc, col("p_retailprice").desc, col("p_partkey").asc),
      Some("""SELECT p_partkey, p_brand, p_retailprice FROM part
              ORDER BY p_brand ASC, p_retailprice DESC, p_partkey ASC""")),

    // R11/R17 — order + limit (top-k rows)
    QueryDef("r11_limit",
      (s, dir) => Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
              ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""")),

    // R12 — row count
    QueryDef("r12_count",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .agg(count(lit(1)).as("cnt")),
      Some("SELECT COUNT(*) AS cnt FROM lineitem")),

    // R13 — pagination: typed search + sort + offset/limit
    QueryDef("r13_pagination",
      (s, dir) => Paginator.paginate(
        Tables.load(s, dir, "customer"),
        Paginator.Params(page = 3, pageSize = 15, search = Some("FURNITURE"),
          sortBy = Some("c_custkey"), sortOrder = "asc")),
      Some("""SELECT * FROM customer
              WHERE c_name ILIKE '%FURNITURE%' OR c_mktsegment ILIKE '%FURNITURE%'
              ORDER BY c_custkey ASC LIMIT 15 OFFSET 30""")),

    // R14 — set operations
    QueryDef("r14_union",
      (s, dir) => Tables.load(s, dir, "customer")
        .filter(col("c_acctbal") > 9900).select(col("c_nationkey").as("nationkey"))
        .union(Tables.load(s, dir, "supplier")
          .filter(col("s_acctbal") > 9000).select(col("s_nationkey").as("nationkey")))
        .distinct()
        .orderBy("nationkey"),
      Some("""SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9900
              UNION
              SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000
              ORDER BY nationkey""")),

    QueryDef("r14_intersect",
      (s, dir) => Tables.load(s, dir, "customer")
        .filter(col("c_acctbal") > 9900).select(col("c_nationkey").as("nationkey"))
        .intersect(Tables.load(s, dir, "supplier")
          .filter(col("s_acctbal") > 9000).select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey"),
      Some("""SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9900
              INTERSECT
              SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000
              ORDER BY nationkey""")),

    QueryDef("r14_except",
      (s, dir) => Tables.load(s, dir, "customer")
        .filter(col("c_acctbal") > 9900).select(col("c_nationkey").as("nationkey"))
        .except(Tables.load(s, dir, "supplier")
          .filter(col("s_acctbal") > 9000).select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey"),
      Some("""SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9900
              EXCEPT
              SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000
              ORDER BY nationkey""")),

    // R15 — CTE (same ANSI text runs on both engines)
    QueryDef("r15_cte", (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(CTE_SQL)
    }, Some(CTE_SQL)),

    // R16 — window functions: ranking, lag, running sum (decimal-exact)
    QueryDef("r16_window",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        Tables.load(s, dir, "orders")
          .filter(col("o_custkey") < 200)
          .select(col("o_custkey"), col("o_orderkey"),
            // long: DuckDB's ROW_NUMBER is BIGINT, Spark's int32
            row_number().over(w).cast("long").as("rn"),
            lag(col("o_totalprice"), 1).over(w).as("prev_price"),
            sum(col("o_totalprice").cast(dec2)).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .cast("double").as("running_spend"))
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey,
              ROW_NUMBER() OVER w AS rn,
              LAG(o_totalprice, 1) OVER w AS prev_price,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
              FROM orders WHERE o_custkey < 200
              WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
              ORDER BY o_custkey, rn""")),

    // R17 — top-k: top 3 nations by revenue, dims broadcast
    QueryDef("r17_topk",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .join(Tables.load(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.load(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.load(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(drevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc)
        .limit(3),
      Some(s"""SELECT n_name,
               ${drevenueSql("l_extendedprice", "l_discount")} AS revenue
               FROM lineitem
               JOIN orders ON l_orderkey = o_orderkey
               JOIN customer ON o_custkey = c_custkey
               JOIN nation ON c_nationkey = n_nationkey
               GROUP BY n_name ORDER BY revenue DESC, n_name ASC LIMIT 3""")),

    // U2 — executeSqlQuery: the gated LLM-SQL entry point end-to-end
    QueryDef("u2_execute_sql", (s, dir) => {
      val engine = new graft.engine.Engine(s, "/root/repo/target/datasets")
      Tables.names.foreach(n => engine.register(n, Tables.load(s, dir, n)))
      engine.executeSqlQuery(U2_SQL)
    }, Some(U2_SQL)),

    // Q4/Q5 — SELECT-only gate + table whitelist, checked differentially:
    // the Spark side evaluates the gate on a fixed corpus; the oracle is
    // the expected verdict table.
    QueryDef("q4_select_gate", (s, dir) => {
      Tables.registerAll(s, dir)
      val cases = Seq(
        ("SELECT 1 AS x", true),
        ("SELECT r_name FROM region", true),
        ("DROP TABLE region", false),
        ("INSERT INTO region VALUES (9, 'x')", false),
        ("SELECT r_name FROM region; DROP TABLE region", false),
        ("CREATE TABLE t AS SELECT 1", false),
        ("SELECT r_name FROM region -- comment", false),
        ("UPDATE region SET r_name = 'x'", false),
      )
      import s.implicits._
      cases.map { case (q, _) =>
        (q, SqlGate.isSqlQuerySafe(s, q))
      }.toDF("query", "is_safe").orderBy("query")
    }, Some("""SELECT * FROM (VALUES
        ('SELECT 1 AS x', TRUE),
        ('SELECT r_name FROM region', TRUE),
        ('DROP TABLE region', FALSE),
        ('INSERT INTO region VALUES (9, ''x'')', FALSE),
        ('SELECT r_name FROM region; DROP TABLE region', FALSE),
        ('CREATE TABLE t AS SELECT 1', FALSE),
        ('SELECT r_name FROM region -- comment', FALSE),
        ('UPDATE region SET r_name = ''x''', FALSE)
      ) AS t(query, is_safe) ORDER BY query""")),

    QueryDef("q5_table_whitelist", (s, dir) => {
      Tables.registerAll(s, dir)
      val known = Tables.names.toSet
      val cases = Seq(
        "SELECT r_name FROM region",
        "SELECT * FROM secret_table",
        "SELECT r_name FROM region JOIN nation ON n_regionkey = r_regionkey",
        "SELECT * FROM region JOIN unknown_x ON true",
        "WITH t AS (SELECT r_name FROM region) SELECT * FROM t",
      )
      import s.implicits._
      cases.map { q =>
        val ok = try { SqlGate.checkTables(s, q, known); true }
          catch { case _: Throwable => false }
        (q, ok)
      }.toDF("query", "allowed").orderBy("query")
    }, Some("""SELECT * FROM (VALUES
        ('SELECT r_name FROM region', TRUE),
        ('SELECT * FROM secret_table', FALSE),
        ('SELECT r_name FROM region JOIN nation ON n_regionkey = r_regionkey', TRUE),
        ('SELECT * FROM region JOIN unknown_x ON true', FALSE),
        ('WITH t AS (SELECT r_name FROM region) SELECT * FROM t', TRUE)
      ) AS t(query, allowed) ORDER BY query""")),

    // Q6 — table/file-name sanitizer as a pure-function differential
    QueryDef("q6_sanitize_names", (s, dir) => {
      import s.implicits._
      val inputs = Seq("My Table-Name!", "order.items", "a" * 80,
        "UPPER_case", "weird$$chars##", "path/to/file.csv")
      inputs.map(n => (n, SqlGate.sanitizeTableNameLowercase(n)))
        .toDF("input", "sanitized").orderBy("input")
    }, Some(s"""SELECT * FROM (VALUES
        ('My Table-Name!', 'my_table_name_'),
        ('order.items', 'order_items'),
        ('${"a" * 80}', '${"a" * 64}'),
        ('UPPER_case', 'upper_case'),
        ('weird$$$$chars##', 'weird__chars__'),
        ('path/to/file.csv', 'path_to_file_csv')
      ) AS t(input, sanitized) ORDER BY input""")),
  )

  private val CTE_SQL =
    """WITH cust_spend AS (
      |  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend,
      |         COUNT(*) AS n_orders
      |  FROM orders GROUP BY o_custkey
      |)
      |SELECT c_mktsegment,
      |       CAST(SUM(CAST(spend AS DECIMAL(28,6))) AS DOUBLE) AS segment_spend,
      |       CAST(SUM(n_orders) AS BIGINT) AS segment_orders
      |FROM cust_spend JOIN customer ON c_custkey = o_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  private val GROUPING_SETS_SQL =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  private val SUBQUERY_SQL =
    """SELECT c_custkey, c_acctbal FROM customer
      |WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
      |  AND c_acctbal > (SELECT MAX(s_acctbal) FROM supplier WHERE s_nationkey = c_nationkey)
      |ORDER BY c_custkey""".stripMargin

  // ranking functions CAST to BIGINT: Spark returns int32, DuckDB int64
  // — the same SQL text must land in the same dtype on both engines for
  // the driver's dtype-sensitive hash
  private val WINDOW_RANK_SQL =
    """SELECT p_partkey, p_brand,
      |  CAST(DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS price_rank,
      |  CAST(NTILE(4) OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS quartile,
      |  FIRST_VALUE(p_partkey) OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS top_part
      |FROM part ORDER BY p_brand, price_rank, p_partkey""".stripMargin

  private val U2_SQL =
    """SELECT n_name, COUNT(*) AS n_customers
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |WHERE c_acctbal > 0
      |GROUP BY n_name ORDER BY n_name""".stripMargin
}
