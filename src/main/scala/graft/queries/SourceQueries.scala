package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.engine.Engine
import graft.plan.DatasetPlanBuilder
import graft.schema._
import graft.sources.Jdbc

/** SURVEY §2.1 sources/sinks (S1, S3–S5, S9–S11) and the semantic-layer
  * L1 paths: compiled dataset plans and relation-joined views (R5).
  *
  * CSV/dataset-store fixtures are written under /root/repo/target (the
  * only writable area) as a deterministic function of the input tables,
  * so the oracle can be expressed against the original parquet.
  */
object SourceQueries {

  private val tmpRoot = "/root/repo/target/graft-tmp"

  def defs: Seq[QueryDef] = Seq(

    // S1 — read_csv with header + schema inference
    QueryDef("s01_read_csv", (s, dir) => {
      val path = s"$tmpRoot/region_csv"
      Tables.load(s, dir, "region")
        .orderBy("r_regionkey")
        .coalesce(1)
        .write.mode("overwrite").option("header", "true").csv(path)
      s.read.option("header", "true").option("inferSchema", "true").csv(path)
        .orderBy("r_regionkey")
    }, Some("SELECT * FROM region ORDER BY r_regionkey")),

    // S3 — CSV scan registered as a temp view, queried via SQL
    QueryDef("s03_csv_scan", (s, dir) => {
      val path = s"$tmpRoot/nation_csv"
      Tables.load(s, dir, "nation")
        .orderBy("n_nationkey")
        .coalesce(1)
        .write.mode("overwrite").option("header", "true").csv(path)
      s.read.option("header", "true").option("inferSchema", "true").csv(path)
        .createOrReplaceTempView("nation_csv")
      s.sql("SELECT n_nationkey, n_name FROM nation_csv WHERE n_regionkey >= 2 ORDER BY n_nationkey")
    }, Some("SELECT n_nationkey, n_name FROM nation WHERE n_regionkey >= 2 ORDER BY n_nationkey")),

    // S4 — parquet scan
    QueryDef("s04_parquet_scan",
      (s, dir) => Tables.load(s, dir, "nation").orderBy("n_nationkey"),
      Some("SELECT * FROM nation ORDER BY n_nationkey")),

    // S5 — in-memory/temp-view registration + SQL over it
    QueryDef("s05_temp_view", (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("SELECT n_name, n_regionkey FROM nation ORDER BY n_name")
    }, Some("SELECT n_name, n_regionkey FROM nation ORDER BY n_name")),

    // S6 — JDBC source end-to-end: nation seeded into an embedded Derby
    // database (the only serverless JDBC engine in the sandbox — it ships
    // on Spark's classpath), then loaded back through a remote-typed
    // schema.yaml whose connection carries an explicit url + driver, i.e.
    // the exact readSource branch a real postgres/mysql source takes
    // (reference: extensions/connectors/sql/pandasai_sql/__init__.py:8-84).
    QueryDef("s06_jdbc", (s, dir) => {
      val url = Jdbc.derbyUrl("graft-s06-db")
      Jdbc.seed(Tables.load(s, dir, "nation"), url, "nation")
      val engine = new Engine(s, s"$tmpRoot/datasets")
      val schema = SemanticSchema(
        name = "nation_jdbc",
        description = Some("nation over JDBC"),
        source = Some(SourceDef("postgres", table = Some("nation"),
          connection = Map("url" -> url, "driver" -> Jdbc.DerbyDriver))))
      engine.createFromSchema("graft/nation_jdbc", schema)
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
    }, Some("SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey")),

    // S9/S10 — dataset store + load round-trip: write data.parquet +
    // schema.yaml under datasets/org/name, reload through the loader
    // factory, query the registered view
    QueryDef("s09_dataset_store_load", (s, dir) => {
      val engine = new Engine(s, s"$tmpRoot/datasets")
      engine.create("graft/customers",
        Tables.load(s, dir, "customer"), Some("customer dataset"))
      engine.executeSqlQuery(
        "SELECT c_custkey, c_name, c_acctbal FROM customers WHERE c_acctbal > 9000 ORDER BY c_custkey")
    }, Some("SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_acctbal > 9000 ORDER BY c_custkey")),

    // S11 — destination sink: declared output written then read back
    QueryDef("s11_sink", (s, dir) => {
      val out = s"$tmpRoot/sink_parquet"
      val df = Tables.load(s, dir, "supplier")
        .filter(col("s_acctbal") > 5000)
        .select("s_suppkey", "s_name", "s_acctbal")
      new Engine(s, s"$tmpRoot/datasets")
        .writeDestination(df, DestinationDef("local", "parquet", out))
      s.read.parquet(out).orderBy("s_suppkey")
    }, Some("SELECT s_suppkey, s_name, s_acctbal FROM supplier WHERE s_acctbal > 5000 ORDER BY s_suppkey")),

    // S12 (beyond-reference format matrix) — JSONL round trip: Spark's
    // json writer emits newline-delimited JSON (the training-data
    // interchange format p57 exports); read back under an EXPLICIT
    // schema — schema-on-read, no inference pass over the data.
    QueryDef("s12_read_jsonl", (s, dir) => {
      val path = s"$tmpRoot/nation_jsonl"
      val nation = Tables.load(s, dir, "nation")
      nation.coalesce(1).write.mode("overwrite").json(path)
      s.read.schema(nation.schema).json(path)
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
    }, Some("SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey")),

    // S13 — ORC round trip: the other columnar format Spark ships a
    // native vectorized reader for; write + read back must be lossless.
    QueryDef("s13_orc_roundtrip", (s, dir) => {
      val path = s"$tmpRoot/supplier_orc"
      Tables.load(s, dir, "supplier")
        .select("s_suppkey", "s_name", "s_nationkey")
        .write.mode("overwrite").orc(path)
      s.read.orc(path).orderBy("s_suppkey")
    }, Some("SELECT s_suppkey, s_name, s_nationkey FROM supplier ORDER BY s_suppkey")),

    // S14 — WARC round trip: documents written as sharded .warc.gz
    // (per-record gzip members — the Common Crawl layout) and read back
    // through the ISO-28500 parser; doc ids recover from the target URI,
    // text from the HTTP body. The warcinfo header records exercise the
    // non-response skip path. Own dir (see the writeIndex race note).
    QueryDef("s14_warc_roundtrip", (s, dir) => {
      val path = s"$tmpRoot/warc_s14_${math.abs(dir.hashCode)}"
      graft.sources.Warc.writeShards(
        Tables.load(s, dir, "documents"), "doc_id", "text", path, shards = 4)
      graft.sources.Warc.read(s, path)
        .where(col("warc_type") === "response")
        .select(
          regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
            .cast("long").as("doc_id"),
          decode(col("payload"), "UTF-8").as("text"),
          col("http_status"))
        .orderBy("doc_id")
    }, Some("""SELECT doc_id, text, CAST(200 AS INTEGER) AS http_status
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // S15 — WebDataset round trip: documents exported as sample-per-
    // basename ustar shards (doc.txt + doc.json per sample — the
    // multimodal training-loader layout), read back and reassembled.
    QueryDef("s15_webdataset_roundtrip", (s, dir) => {
      val path = s"$tmpRoot/wds_s15_${math.abs(dir.hashCode)}"
      graft.sources.WebDataset.writeShards(
        Tables.load(s, dir, "documents"), "doc_id",
        Seq("txt" -> col("text"),
          "json" -> to_json(struct(col("lang"), col("source")))),
        path, shards = 4)
      val meta = org.apache.spark.sql.types.StructType
        .fromDDL("lang string, source string")
      graft.sources.WebDataset.read(s, path)
        .groupBy(col("key").cast("long").as("doc_id"))
        .agg(
          first(when(col("ext") === "txt", decode(col("payload"), "UTF-8")),
            ignoreNulls = true).as("text"),
          from_json(first(when(col("ext") === "json",
            decode(col("payload"), "UTF-8")), ignoreNulls = true), meta).as("m"))
        .select(col("doc_id"), col("text"), col("m.lang"), col("m.source"))
        .orderBy("doc_id")
    }, Some("SELECT doc_id, text, lang, source FROM documents ORDER BY doc_id")),

    // S16 — offset-indexed WARC fetch (the CDX pattern): shards written
    // with a per-record byte-range index, then ONLY the wanted records
    // (doc_id % 7 = 0) read back via positioned range reads — the
    // touch-0.01%-of-the-archive access path.
    QueryDef("s16_warc_fetch", (s, dir) => {
      val path = s"$tmpRoot/warc_s16_${math.abs(dir.hashCode)}"
      graft.sources.Warc.writeShardsIndexed(
        Tables.load(s, dir, "documents"), "doc_id", "text", path, shards = 4)
      val wanted = Tables.load(s, dir, "documents")
        .where(pmod(col("doc_id"), lit(7)) === 0)
        .select(col("doc_id").cast("string").as("id"))
      graft.sources.Warc.fetch(s, path, wanted)
        .select(
          regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
            .cast("long").as("doc_id"),
          decode(col("payload"), "UTF-8").as("text"))
        .orderBy("doc_id")
    }, Some("""SELECT doc_id, text FROM documents
              |WHERE doc_id % 7 = 0 ORDER BY doc_id""".stripMargin)),

    // S17 — WET round trip: the extracted-text layout (conversion
    // records, plain-text blocks, no HTTP wrapper); the reader's
    // non-http path carries the payload whole with a null status.
    QueryDef("s17_wet_roundtrip", (s, dir) => {
      val path = s"$tmpRoot/wet_s17_${math.abs(dir.hashCode)}"
      graft.sources.Warc.writeWetShards(
        Tables.load(s, dir, "documents"), "doc_id", "text", path, shards = 4)
      graft.sources.Warc.read(s, path)
        .where(col("warc_type") === "conversion")
        .select(
          regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
            .cast("long").as("doc_id"),
          decode(col("payload"), "UTF-8").as("text"),
          col("http_status"))
        .orderBy("doc_id")
    }, Some("""SELECT doc_id, text, CAST(NULL AS INTEGER) AS http_status
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // L1 — compiled semantic dataset: declared columns with expressions,
    // group_by + order_by + limit, straight from a schema definition
    // (the reference's `SELECT cols FROM src GROUP BY ... ORDER BY ...
    // LIMIT n` shape, base_query_builder.py:25-42)
    QueryDef("l1_semantic_dataset", (s, dir) => {
      val schema = SemanticSchema(
        name = "order_stats",
        source = Some(SourceDef("parquet", path = Some("orders.parquet"))),
        columns = Seq(
          ColumnDef("o_orderstatus"),
          ColumnDef("total_spend",
            expression = Some("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)")),
          ColumnDef("n_orders", expression = Some("COUNT(*)")),
        ),
        groupBy = Seq("o_orderstatus"),
        orderBy = Seq("o_orderstatus ASC"),
        limit = Some(10),
      ).validate()
      DatasetPlanBuilder.build(s, schema, dir, n => Tables.load(s, dir, n))
    }, Some("""SELECT o_orderstatus,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
               COUNT(*) AS n_orders
               FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus ASC LIMIT 10""")),

    // R5/L1 — view: relation-grouped equi-join of two compiled datasets
    // with `dataset.column` → `dataset_column` aliasing
    // (view_query_builder.py:29-45,100-148)
    QueryDef("l1_semantic_view", (s, dir) => {
      val view = SemanticSchema(
        name = "cust_nation",
        view = true,
        columns = Seq(
          ColumnDef("customers.c_custkey"),
          ColumnDef("customers.c_acctbal"),
          ColumnDef("nations.n_name"),
        ),
        relations = Seq(RelationDef(None, None,
          "customers.c_nationkey", "nations.n_nationkey")),
        orderBy = Seq("customers.c_custkey ASC"),
      ).validate()
      val deps = Map(
        "customers" -> Tables.load(s, dir, "customer"),
        "nations" -> Tables.load(s, dir, "nation"))
      graft.plan.ViewPlanBuilder.build(s, view, deps(_))
    }, Some("""SELECT c_custkey AS customers_c_custkey, c_acctbal AS customers_c_acctbal,
               n_name AS nations_n_name
               FROM customer JOIN nation ON c_nationkey = n_nationkey
               ORDER BY customers_c_custkey ASC""")),

    // L1 view with group_by over the aliased columns
    QueryDef("l1_view_groupby", (s, dir) => {
      val view = SemanticSchema(
        name = "nation_balance",
        view = true,
        columns = Seq(
          ColumnDef("nations.n_name"),
          ColumnDef("customers.total_bal",
            expression = Some("CAST(SUM(CAST(customers.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)")),
        ),
        relations = Seq(RelationDef(None, None,
          "customers.c_nationkey", "nations.n_nationkey")),
        groupBy = Seq("nations.n_name"),
        orderBy = Seq("nations.n_name ASC"),
      ).validate()
      val deps = Map(
        "customers" -> Tables.load(s, dir, "customer"),
        "nations" -> Tables.load(s, dir, "nation"))
      graft.plan.ViewPlanBuilder.build(s, view, deps(_))
    }, Some("""SELECT n_name AS nations_n_name,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS customers_total_bal
               FROM customer JOIN nation ON c_nationkey = n_nationkey
               GROUP BY n_name ORDER BY n_name ASC""")),
  )
}
