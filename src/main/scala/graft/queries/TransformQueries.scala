package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables
import graft.plan.DatasetPlanBuilder
import graft.schema._

/** SURVEY §2.4 — the 29 named transformations (T29 `encode_categorical`
  * is error-compatible: it throws at build time and is covered by a
  * ScalaTest, not a query). Each query drives the FULL L1 path: a
  * SemanticSchema with the transformation declared, compiled by
  * DatasetPlanBuilder — not an ad-hoc column call.
  *
  * All queries order by the table's key column (never by a nullable
  * transformed column — Spark and DuckDB disagree on default NULL
  * ordering).
  */
object TransformQueries {

  /** L1 dataset over one parquet table + transformations. */
  private def l1(
      s: SparkSession, dir: String, table: String,
      cols: Seq[ColumnDef], transforms: Seq[TransformDef],
      orderBy: Seq[String],
  ): DataFrame = {
    val schema = SemanticSchema(
      name = table,
      source = Some(SourceDef("parquet", path = Some(s"$table.parquet"))),
      columns = cols,
      transformations = transforms,
      orderBy = orderBy,
    ).validate()
    DatasetPlanBuilder.build(s, schema, dir, n => Tables.load(s, dir, n))
  }

  private def t(ttype: String, params: (String, Any)*): TransformDef =
    TransformDef(ttype, params.toMap)

  def defs: Seq[QueryDef] = Seq(

    QueryDef("t01_anonymize",
      (s, dir) => l1(s, dir, "customer",
        Seq(ColumnDef("c_custkey"), ColumnDef("c_name")),
        Seq(t("anonymize", "column" -> "c_name")),
        Seq("c_custkey ASC")),
      Some("SELECT c_custkey, md5(c_name) AS c_name FROM customer ORDER BY c_custkey ASC")),

    QueryDef("t02_fill_na",
      (s, dir) => l1(s, dir, "customer",
        Seq(ColumnDef("c_custkey"),
          ColumnDef("acctbal",
            expression = Some("CASE WHEN c_acctbal < 1000 THEN NULL ELSE c_acctbal END"))),
        Seq(t("fill_na", "column" -> "acctbal", "value" -> -1.0)),
        Seq("c_custkey ASC")),
      Some("""SELECT c_custkey,
              COALESCE(CASE WHEN c_acctbal < 1000 THEN NULL ELSE c_acctbal END, -1.0) AS acctbal
              FROM customer ORDER BY c_custkey ASC""")),

    QueryDef("t03_map_values",
      (s, dir) => l1(s, dir, "customer",
        Seq(ColumnDef("c_custkey"), ColumnDef("c_mktsegment")),
        Seq(TransformDef("map_values", Map("column" -> "c_mktsegment",
          "mapping" -> Map("BUILDING" -> "B2B", "AUTOMOBILE" -> "AUTO")))),
        Seq("c_custkey ASC")),
      Some("""SELECT c_custkey,
              CASE WHEN c_mktsegment = 'BUILDING' THEN 'B2B'
                   WHEN c_mktsegment = 'AUTOMOBILE' THEN 'AUTO'
                   ELSE c_mktsegment END AS c_mktsegment
              FROM customer ORDER BY c_custkey ASC""")),

    QueryDef("t04_to_lowercase",
      (s, dir) => l1(s, dir, "customer",
        Seq(ColumnDef("c_custkey"), ColumnDef("c_mktsegment")),
        Seq(t("to_lowercase", "column" -> "c_mktsegment")),
        Seq("c_custkey ASC")),
      Some("SELECT c_custkey, LOWER(c_mktsegment) AS c_mktsegment FROM customer ORDER BY c_custkey ASC")),

    QueryDef("t05_to_uppercase",
      (s, dir) => l1(s, dir, "part",
        Seq(ColumnDef("p_partkey"), ColumnDef("p_name")),
        Seq(t("to_uppercase", "column" -> "p_name")),
        Seq("p_partkey ASC")),
      Some("SELECT p_partkey, UPPER(p_name) AS p_name FROM part ORDER BY p_partkey ASC")),

    QueryDef("t06_round_numbers",
      (s, dir) => l1(s, dir, "customer",
        Seq(ColumnDef("c_custkey"), ColumnDef("c_acctbal")),
        Seq(t("round_numbers", "column" -> "c_acctbal", "decimals" -> 1)),
        Seq("c_custkey ASC")),
      Some("SELECT c_custkey, ROUND(c_acctbal, 1) AS c_acctbal FROM customer ORDER BY c_custkey ASC")),

    QueryDef("t07_format_date",
      (s, dir) => l1(s, dir, "orders",
        Seq(ColumnDef("o_orderkey"), ColumnDef("o_orderdate")),
        Seq(t("format_date", "column" -> "o_orderdate", "format" -> "%Y-%m-%d")),
        Seq("o_orderkey ASC")),
      Some("SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate FROM orders ORDER BY o_orderkey ASC")),

    QueryDef("t08_truncate",
      (s, dir) => l1(s, dir, "part",
        Seq(ColumnDef("p_partkey"), ColumnDef("p_name")),
        Seq(t("truncate", "column" -> "p_name", "length" -> 5)),
        Seq("p_partkey ASC")),
      Some("SELECT p_partkey, LEFT(p_name, 5) AS p_name FROM part ORDER BY p_partkey ASC")),

    QueryDef("t09_scale",
      (s, dir) => l1(s, dir, "lineitem",
        Seq(ColumnDef("l_orderkey"), ColumnDef("l_linenumber"), ColumnDef("l_quantity")),
        Seq(t("scale", "column" -> "l_quantity", "factor" -> 2.5)),
        Seq("l_orderkey ASC", "l_linenumber ASC")),
      Some("SELECT l_orderkey, l_linenumber, l_quantity * 2.5 AS l_quantity FROM lineitem ORDER BY l_orderkey ASC, l_linenumber ASC")),

    // min/max are exact → per-row double math identical in both engines
    QueryDef("t10_normalize",
      (s, dir) => l1(s, dir, "customer",
        Seq(ColumnDef("c_custkey"), ColumnDef("c_acctbal")),
        Seq(t("normalize", "column" -> "c_acctbal")),
        Seq("c_custkey ASC")),
      Some("""SELECT c_custkey,
              (c_acctbal - MIN(c_acctbal) OVER ()) / (MAX(c_acctbal) OVER () - MIN(c_acctbal) OVER ()) AS c_acctbal
              FROM customer ORDER BY c_custkey ASC""")),

    // avg/stddev sums are order-dependent → round to 6 decimals both sides
    QueryDef("t11_standardize",
      (s, dir) => {
        val df = l1(s, dir, "customer",
          Seq(ColumnDef("c_custkey"), ColumnDef("c_acctbal")),
          Seq(t("standardize", "column" -> "c_acctbal")),
          Seq("c_custkey ASC"))
        df.selectExpr("c_custkey", "round(c_acctbal, 6) AS c_acctbal")
      },
      Some("""SELECT c_custkey,
              ROUND((c_acctbal - AVG(c_acctbal) OVER ()) / STDDEV_SAMP(c_acctbal) OVER (), 6) AS c_acctbal
              FROM customer ORDER BY c_custkey ASC""")),

    // UTC→UTC identity (the reference's defaults)
    QueryDef("t12_convert_timezone",
      (s, dir) => l1(s, dir, "orders",
        Seq(ColumnDef("o_orderkey"), ColumnDef("o_orderdate")),
        Seq(t("convert_timezone", "column" -> "o_orderdate",
          "from" -> "UTC", "to" -> "UTC")),
        Seq("o_orderkey ASC"))
        .selectExpr("o_orderkey", "CAST(o_orderdate AS TIMESTAMP_NTZ) AS o_orderdate"),
      Some("SELECT o_orderkey, o_orderdate FROM orders ORDER BY o_orderkey ASC")),

    QueryDef("t13_strip",
      (s, dir) => l1(s, dir, "customer",
        Seq(ColumnDef("c_custkey"),
          ColumnDef("seg", expression = Some("'  ' || c_mktsegment || ' '"))),
        Seq(t("strip", "column" -> "seg")),
        Seq("c_custkey ASC")),
      Some("SELECT c_custkey, TRIM('  ' || c_mktsegment || ' ') AS seg FROM customer ORDER BY c_custkey ASC")),

    // Final cast to double on BOTH sides: the transformation itself yields
    // DECIMAL(18,3) (reference semantics, asserted in TransformationsSpec), but
    // decimal *renderings* differ between engines ("1.450" vs "1.45") and break
    // the driver's value hash even when the numbers are identical.
    QueryDef("t14_to_numeric",
      (s, dir) => l1(s, dir, "customer",
        Seq(ColumnDef("c_custkey"), ColumnDef("c_acctbal")),
        Seq(t("to_numeric", "column" -> "c_acctbal")),
        Seq("c_custkey ASC"))
        .selectExpr("c_custkey", "CAST(c_acctbal AS DOUBLE) AS c_acctbal"),
      Some("SELECT c_custkey, CAST(CAST(c_acctbal AS DECIMAL(18,3)) AS DOUBLE) AS c_acctbal FROM customer ORDER BY c_custkey ASC")),

    QueryDef("t15_to_datetime",
      (s, dir) => l1(s, dir, "orders",
        Seq(ColumnDef("o_orderkey"),
          ColumnDef("d_str", expression = Some("date_format(o_orderdate, 'yyyy-MM-dd')"))),
        Seq(t("to_datetime", "column" -> "d_str", "format" -> "%Y-%m-%d")),
        Seq("o_orderkey ASC"))
        .selectExpr("o_orderkey", "CAST(d_str AS TIMESTAMP_NTZ) AS d_str"),
      Some("SELECT o_orderkey, strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS d_str FROM orders ORDER BY o_orderkey ASC")),

    QueryDef("t16_replace",
      (s, dir) => l1(s, dir, "customer",
        Seq(ColumnDef("c_custkey"), ColumnDef("c_name")),
        Seq(t("replace", "column" -> "c_name",
          "old_value" -> "Customer#", "new_value" -> "C-")),
        Seq("c_custkey ASC")),
      Some("SELECT c_custkey, REPLACE(c_name, 'Customer#', 'C-') AS c_name FROM customer ORDER BY c_custkey ASC")),

    QueryDef("t17_extract",
      (s, dir) => l1(s, dir, "customer",
        Seq(ColumnDef("c_custkey"), ColumnDef("c_name")),
        Seq(t("extract", "column" -> "c_name", "pattern" -> "[0-9]+")),
        Seq("c_custkey ASC")),
      Some("SELECT c_custkey, NULLIF(regexp_extract(c_name, '[0-9]+'), '') AS c_name FROM customer ORDER BY c_custkey ASC")),

    QueryDef("t18_pad",
      (s, dir) => l1(s, dir, "customer",
        Seq(ColumnDef("c_custkey"),
          ColumnDef("key_str", expression = Some("CAST(c_custkey AS STRING)"))),
        Seq(t("pad", "column" -> "key_str", "width" -> 10,
          "side" -> "left", "pad_char" -> "0")),
        Seq("c_custkey ASC")),
      Some("SELECT c_custkey, LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS key_str FROM customer ORDER BY c_custkey ASC")),

    QueryDef("t19_clip",
      (s, dir) => l1(s, dir, "customer",
        Seq(ColumnDef("c_custkey"), ColumnDef("c_acctbal")),
        Seq(t("clip", "column" -> "c_acctbal", "lower" -> 0, "upper" -> 5000)),
        Seq("c_custkey ASC")),
      Some("SELECT c_custkey, LEAST(GREATEST(c_acctbal, 0.0), 5000.0) AS c_acctbal FROM customer ORDER BY c_custkey ASC")),

    QueryDef("t20_bin",
      (s, dir) => l1(s, dir, "customer",
        Seq(ColumnDef("c_custkey"), ColumnDef("c_acctbal")),
        Seq(TransformDef("bin", Map("column" -> "c_acctbal",
          "bins" -> Seq(0, 2500, 5000, 10000),
          "labels" -> Seq("low", "mid", "high")))),
        Seq("c_custkey ASC")),
      Some("""SELECT c_custkey,
              CASE WHEN c_acctbal >= 0.0 AND c_acctbal < 2500.0 THEN 'low'
                   WHEN c_acctbal >= 2500.0 AND c_acctbal < 5000.0 THEN 'mid'
                   WHEN c_acctbal >= 5000.0 AND c_acctbal < 10000.0 THEN 'high'
                   ELSE CAST(c_acctbal AS VARCHAR) END AS c_acctbal
              FROM customer ORDER BY c_custkey ASC""")),

    QueryDef("t21_validate_email",
      (s, dir) => l1(s, dir, "customer",
        Seq(ColumnDef("c_custkey"),
          ColumnDef("email", expression = Some(
            "CASE WHEN c_custkey % 5 = 0 THEN 'not an email' ELSE replace(lower(c_name), '#', '') || '@example.com' END"))),
        Seq(t("validate_email", "column" -> "email")),
        Seq("c_custkey ASC")),
      Some("""SELECT c_custkey,
              CASE WHEN regexp_matches(e, '^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$') THEN e ELSE NULL END AS email
              FROM (SELECT c_custkey,
                    CASE WHEN c_custkey % 5 = 0 THEN 'not an email' ELSE replace(lower(c_name), '#', '') || '@example.com' END AS e
                    FROM customer) t ORDER BY c_custkey ASC""")),

    QueryDef("t22_validate_date_range",
      (s, dir) => l1(s, dir, "orders",
        Seq(ColumnDef("o_orderkey"), ColumnDef("o_orderdate")),
        Seq(t("validate_date_range", "column" -> "o_orderdate",
          "start_date" -> "1996-01-01", "end_date" -> "1998-12-31")),
        Seq("o_orderkey ASC"))
        .selectExpr("o_orderkey", "CAST(o_orderdate AS TIMESTAMP_NTZ) AS o_orderdate"),
      Some("""SELECT o_orderkey,
              CASE WHEN o_orderdate BETWEEN '1996-01-01' AND '1998-12-31' THEN o_orderdate ELSE NULL END AS o_orderdate
              FROM orders ORDER BY o_orderkey ASC""")),

    QueryDef("t23_normalize_phone",
      (s, dir) => l1(s, dir, "customer",
        Seq(ColumnDef("c_custkey"),
          ColumnDef("phone", expression = Some("'(555) ' || CAST(c_custkey AS STRING)"))),
        Seq(t("normalize_phone", "column" -> "phone", "country_code" -> "+1")),
        Seq("c_custkey ASC")),
      Some("""SELECT c_custkey,
              '+1' || regexp_replace('(555) ' || CAST(c_custkey AS VARCHAR), '[^0-9]', '', 'g') AS phone
              FROM customer ORDER BY c_custkey ASC""")),

    QueryDef("t24_remove_duplicates",
      (s, dir) => l1(s, dir, "customer",
        Seq(ColumnDef("c_nationkey"), ColumnDef("c_mktsegment")),
        Seq(t("remove_duplicates", "column" -> "c_mktsegment")),
        Seq("c_nationkey ASC", "c_mktsegment ASC")),
      Some("""SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
              ORDER BY c_nationkey ASC, c_mktsegment ASC""")),

    // deliberately mismatched FK (custkey ∈ suppkey range?) so both
    // branches of the CASE are exercised
    QueryDef("t25_validate_foreign_key",
      (s, dir) => l1(s, dir, "customer",
        Seq(ColumnDef("c_name"), ColumnDef("c_custkey")),
        Seq(t("validate_foreign_key", "column" -> "c_custkey",
          "ref_table" -> "supplier", "ref_column" -> "s_suppkey")),
        Seq("c_name ASC")),
      Some("""SELECT c_name,
              CASE WHEN c_custkey IN (SELECT s_suppkey FROM supplier) THEN c_custkey ELSE NULL END AS c_custkey
              FROM customer ORDER BY c_name ASC""")),

    QueryDef("t26_ensure_positive",
      (s, dir) => l1(s, dir, "customer",
        Seq(ColumnDef("c_custkey"), ColumnDef("c_acctbal")),
        Seq(t("ensure_positive", "column" -> "c_acctbal")),
        Seq("c_custkey ASC")),
      Some("SELECT c_custkey, CASE WHEN c_acctbal > 0 THEN c_acctbal ELSE NULL END AS c_acctbal FROM customer ORDER BY c_custkey ASC")),

    QueryDef("t27_standardize_categories",
      (s, dir) => l1(s, dir, "customer",
        Seq(ColumnDef("c_custkey"),
          ColumnDef("seg", expression = Some("lower(c_mktsegment)"))),
        Seq(TransformDef("standardize_categories", Map("column" -> "seg",
          "mapping" -> Map("building" -> "Building", "machinery" -> "Machinery")))),
        Seq("c_custkey ASC")),
      Some("""SELECT c_custkey,
              CASE WHEN LOWER(lower(c_mktsegment)) = LOWER('building') THEN 'Building'
                   WHEN LOWER(lower(c_mktsegment)) = LOWER('machinery') THEN 'Machinery'
                   ELSE lower(c_mktsegment) END AS seg
              FROM customer ORDER BY c_custkey ASC""")),

    QueryDef("t28_rename",
      (s, dir) => l1(s, dir, "customer",
        Seq(ColumnDef("c_custkey"), ColumnDef("c_acctbal")),
        Seq(t("rename", "column" -> "c_acctbal", "new_name" -> "balance")),
        Seq("c_custkey ASC")),
      Some("SELECT c_custkey, c_acctbal AS balance FROM customer ORDER BY c_custkey ASC")),
  )
}
