package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one entry per implemented operator from SURVEY.md §2
  * (sources S, relational R, SQL-infra Q + U2, transformations T, the L1
  * semantic layer, and the beyond-reference pipeline operators P).
  * `oracleSql` holds the DuckDB-equivalent SQL for every entry whose
  * semantics DuckDB can express; hash-based/LSH operators are rows-only.
  */
object SparkEntry {

  private val allDefs: Seq[QueryDef] =
    SourceQueries.defs ++ RelationalQueries.defs ++
      TransformQueries.defs ++ PipelineQueries.defs ++ OperatorQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The P1 spine: fact-fact joins shuffle on their keys, nation/region
    * dims broadcast, decimal-exact revenue aggregation, top-5.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val lineitem = Tables.load(spark, dir, "lineitem")
    val orders = Tables.load(spark, dir, "orders")
    val customer = Tables.load(spark, dir, "customer")
    // loadForJoin broadcast-hints the fixed-size dims (Tables.broadcastable)
    val nation = Tables.loadForJoin(spark, dir, "nation")
    val region = Tables.loadForJoin(spark, dir, "region")
    lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .join(region, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(QueryDef.drevenue(col("l_extendedprice"), col("l_discount"))
        .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name").asc)
      .limit(5)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
