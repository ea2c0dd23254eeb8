package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One driver-checkable query: a Spark plan + (when SQL-expressible) the
  * equivalent DuckDB oracle SQL. Column names are aliased identically on
  * both sides — the driver sorts columns by name before hashing.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)

object QueryDef {

  /** Deterministic-aggregation helpers.
    *
    * Double sums are order-dependent: Spark's parallel partial aggregation
    * and DuckDB's sequential scan sum in different orders, so raw
    * SUM(double) differs in the low bits and fails a hash compare.
    * Accumulating in DECIMAL is exact (associative), identical in both
    * engines, and the final CAST to DOUBLE is deterministic. The decimal
    * sum is still a single map-side-combined hash aggregate — no scale
    * penalty.
    */
  val dec2: DecimalType = DecimalType(18, 2)

  /** Spark side: exact decimal sum surfaced as double. */
  def dsum(c: Column): Column = sum(c.cast(dec2)).cast("double")

  /** Oracle side of [[dsum]]. */
  def dsumSql(e: String): String =
    s"CAST(SUM(CAST($e AS DECIMAL(18,2))) AS DOUBLE)"

  /** Deterministic average: exact decimal sum / count, divided as doubles
    * in both engines. */
  def davg(c: Column): Column =
    sum(c.cast(dec2)).cast("double") / count(c).cast("double")

  def davgSql(e: String): String =
    s"(CAST(SUM(CAST($e AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT($e) AS DOUBLE))"

  /** Deterministic sample stddev from exact decimal sums:
    * sqrt((Σx² − (Σx)²/n) / (n−1)), all double math on identical inputs.
    */
  def dstddev(c: Column): Column = {
    val s = sum(c.cast(dec2)).cast("double")
    val s2 = sum(c.cast(dec2) * c.cast(dec2)).cast("double")
    val n = count(c).cast("double")
    sqrt((s2 - s * s / n) / (n - lit(1.0)))
  }

  def dstddevSql(e: String): String = {
    val d = s"CAST($e AS DECIMAL(18,2))"
    s"SQRT((CAST(SUM($d * $d) AS DOUBLE) - CAST(SUM($d) AS DOUBLE) * CAST(SUM($d) AS DOUBLE) / CAST(COUNT($e) AS DOUBLE)) / (CAST(COUNT($e) AS DOUBLE) - 1.0))"
  }

  /** Deterministic revenue-style sum: Σ price·(1−disc). The factors are
    * cast to decimal BEFORE multiplying — casting the double PRODUCT
    * rounds differently across engines when it lands on a half-cent
    * boundary (Spark casts via exact BigDecimal, DuckDB via double
    * multiply + llround), whereas the stored 2-decimal inputs are never
    * near a boundary.
    */
  def drevenue(price: Column, disc: Column): Column =
    sum(price.cast(dec2) * (lit(1) - disc.cast(dec2))).cast("double")

  def drevenueSql(price: String, disc: String): String =
    s"CAST(SUM(CAST($price AS DECIMAL(18,2)) * (1 - CAST($disc AS DECIMAL(18,2)))) AS DOUBLE)"

  /** Spark writes timestamps as UTC-adjusted (isAdjustedToUTC=true);
    * DuckDB produces naive timestamps. Under a UTC session the values are
    * identical — casting the OUTPUT column to TIMESTAMP_NTZ makes the
    * parquet physical type match the oracle's. Harness-compat only.
    */
  def ntz(c: Column): Column = c.cast("timestamp_ntz")
}
