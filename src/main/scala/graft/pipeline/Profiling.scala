package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset profiling — the look-before-you-ingest card run on every new
  * raw source: per column, null coverage, type-inference votes
  * (integer / float / date-shaped value fractions over the STRING
  * rendering), distinct counts, and lexicographic extrema. This is the
  * schema-on-read companion to the semantic layer's declared types: the
  * profile tells you what a column actually holds before you declare
  * what it should.
  */
object Profiling {

  private val intRe = "^-?\\d+$"
  private val floatRe = "^-?\\d+\\.\\d+$"
  private val dateRe = "^\\d{4}-\\d{2}-\\d{2}"

  /** Schema-evolution diff between two snapshots of a dataset — the
    * metadata companion to [[Curation.corpusDiff]]'s content diff, and
    * the guard an ingest runs before a schema change silently breaks
    * downstream semantic-layer declarations. Schemas are driver
    * metadata (no data is read); the result is a tiny local frame.
    *
    * @return (column, old_type, new_type, status) with status ∈
    *         added | removed | type_changed | unchanged, ordered by
    *         column name
    */
  def schemaDiff(old: DataFrame, cur: DataFrame): DataFrame = {
    val spark = old.sparkSession
    import spark.implicits._
    val o = old.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val c = cur.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    (o.keySet ++ c.keySet).toSeq.sorted.map { n =>
      val status = (o.get(n), c.get(n)) match {
        case (Some(a), Some(b)) if a == b => "unchanged"
        case (Some(_), Some(_))           => "type_changed"
        case (Some(_), None)              => "removed"
        case (None, Some(_))              => "added"
        case (None, None)                 => throw new IllegalStateException(n)
      }
      (n, o.get(n).orNull, c.get(n).orNull, status)
    }.toDF("column", "old_type", "new_type", "status")
  }

  /** Per-column profile in ONE pass: the columns explode into
    * (column, string-value) rows — a map-only generate, so the single
    * column-keyed aggregate (map-side combined; ~#columns exchange
    * rows for the sums) is the only shuffle besides the exact-distinct
    * expansion.
    *
    * @param exact true → exact `count_distinct` (the oracle-pinned
    *   path; its two-phase distinct expansion shuffles one row per
    *   distinct (column, value) — fine for profiling runs). false →
    *   `approx_count_distinct` (HLL++, map-side combined) — the 100 TB
    *   path where exact distincts of a high-cardinality column would
    *   dominate the job (same dial as corpusStats; see also the KMV
    *   sketch for a mergeable artifact).
    * @return (column, n_rows, n_null, n_int_like, n_float_like,
    *         n_date_like, n_distinct, min_v, max_v) — *_like counts
    *         cover non-null values only; min/max are lexicographic
    *         over the string rendering
    */
  def profileColumns(
      df: DataFrame, cols: Seq[String], exact: Boolean = true,
  ): DataFrame = {
    require(cols.nonEmpty, "profileColumns: need at least one column")
    val rows = df
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("column"), col(c).cast("string").as("v"))): _*)).as("f"))
      .select(col("f.column").as("column"), col("f.v").as("v"))
    def cnt(c: Column): Column = coalesce(sum(c.cast("long")), lit(0L))
    val distinctAgg =
      if (exact) count_distinct(col("v")).as("n_distinct")
      else approx_count_distinct(col("v")).as("n_distinct")
    rows.groupBy("column").agg(
      count(lit(1)).as("n_rows"),
      cnt(col("v").isNull).as("n_null"),
      cnt(col("v").rlike(intRe)).as("n_int_like"),
      cnt(col("v").rlike(floatRe)).as("n_float_like"),
      cnt(col("v").rlike(dateRe)).as("n_date_like"),
      distinctAgg,
      min(col("v")).as("min_v"),
      max(col("v")).as("max_v"))
  }

  /** Concentration card for a categorical key (host, source, domain):
    * how unevenly rows spread across keys — the "is one host half the
    * crawl" question a mix designer asks before capping. One row:
    * (n_keys, n_rows, top_share, gini), 6-rounded.
    *
    * The Gini coefficient is computed WITHOUT ranking the keys:
    * keys with equal counts collapse into the count-of-counts frame
    * (count value k → #keys fₖ), whose size is bounded by √(2·n_rows)
    * — distinct positive integers summing to n_rows can't number more
    * — so at 10B rows it is ≤ ~140k rows. Over that frame, sorted by
    * k, one prefix-sum window gives the mean-absolute-difference sum
    * exactly: Σ_{pairs} |cᵢ−cⱼ| = 2·Σₖ fₖ·(k·F₍₋₎ − S₍₋₎) with
    * F₍₋₎/S₍₋₎ the running key/mass totals of smaller counts. So the
    * corpus-scale work is ONE map-side-combined key count; the single-
    * partition sort touches only the √n-bounded frame. Pure integer
    * arithmetic until the final division — replayable anywhere.
    * gini = Σₖ fₖ·(k·F₍₋₎ − S₍₋₎) / (n_keys · n_rows).
    */
  def concentration(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("__c"))
    val cc = counts.groupBy("__c").agg(count(lit(1)).as("__f"))
    val w = Window.orderBy("__c")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val dsum = cc
      .withColumn("__fb", coalesce(sum("__f").over(w), lit(0L)))
      .withColumn("__sb", coalesce(sum(col("__c") * col("__f")).over(w), lit(0L)))
      .agg(coalesce(sum(col("__f") *
        (col("__c") * col("__fb") - col("__sb"))), lit(0L)).as("__dsum"))
    cc.agg(sum("__f").as("__nk"),
        coalesce(sum(col("__c") * col("__f")), lit(0L)).as("__n"),
        max("__c").as("__top"))
      .crossJoin(broadcast(dsum)) // 1-row scalar idiom
      .select(
        col("__nk").as("n_keys"),
        col("__n").as("n_rows"),
        round(col("__top").cast("double") / col("__n"), 6).as("top_share"),
        round(col("__dsum").cast("double") /
          (col("__nk") * col("__n")), 6).as("gini"))
  }
}
