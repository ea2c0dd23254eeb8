package graft.transform

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.schema.TransformDef
import graft.types.Strftime

/** The reference's 29 named column transformations re-expressed as native
  * Spark `Column` operations (reference:
  * pandasai/query_builders/sql_transformation_manager.py:36-288). They
  * chain in declaration order (:40-45) and match their target column
  * case-insensitively (:249-269).
  *
  * Design notes (scale):
  *  - `normalize`/`standardize` — the reference emits bare aggregates in
  *    the projection (:118-124), only legal in an aggregate context. We
  *    implement the documented intent (min-max / z-score scaling) as a
  *    TWO-PASS plan: a 1-row global aggregate broadcast-cross-joined onto
  *    the frame, then a per-row expression. No global window (which would
  *    funnel every row through one partition at 100 TB).
  *  - `validate_foreign_key` — the reference emits `x IN (SELECT ...)`
  *    (:216-220). We join against the DISTINCT reference keys (dimension
  *    sized → AQE broadcasts it) and null out misses; row count is
  *    preserved because the join keys are distinct.
  *  - `remove_duplicates` — whole-plan DISTINCT, handled by the plan
  *    builder (reference: base_query_builder.py:93-103).
  *  - `encode_categorical` — declared valid but unimplemented in the
  *    reference (constants.py:73 vs sql_transformation_manager.py:43-47);
  *    we reproduce the build-time error.
  */
object Transformations {

  final class UnsupportedTransformationError(ttype: String)
      extends IllegalArgumentException(s"Unsupported transformation type: _$ttype")

  private val tmpId = new AtomicLong(0)
  private def fresh(prefix: String): String =
    s"__graft_${prefix}_${tmpId.incrementAndGet()}"

  /** Transformations that only rewrite the column expression. */
  def isPerRow(ttype: String): Boolean =
    !Set("normalize", "standardize", "validate_foreign_key",
      "remove_duplicates", "rename").contains(ttype)

  /** Apply one transformation. Returns the (possibly re-planned) frame and
    * the new column expression. `resolveTable` materializes a reference
    * table for `validate_foreign_key`.
    */
  def applyOne(
      df: DataFrame,
      expr: Column,
      t: TransformDef,
      resolveTable: String => DataFrame,
  ): (DataFrame, Column) = t.ttype match {
    case "anonymize" => (df, md5(expr.cast("string")))
    case "fill_na" =>
      val v = t.params.getOrElse("value",
        throw new IllegalArgumentException("fill_na requires 'value'"))
      (df, coalesce(expr, lit(v)))
    case "map_values" =>
      val m = t.mapping
      if (m.isEmpty) (df, expr)
      else {
        val cased = m.foldLeft(Option.empty[Column]) { case (acc, (k, v)) =>
          Some(acc.fold(when(expr === lit(k), lit(v)))(_.when(expr === lit(k), lit(v))))
        }.get
        (df, cased.otherwise(expr))
      }
    case "to_lowercase" => (df, lower(expr))
    case "to_uppercase" => (df, upper(expr))
    case "round_numbers" =>
      (df, round(expr, t.num("decimals").getOrElse(0.0).toInt))
    case "format_date" =>
      val fmt = t.str("format").getOrElse("%Y-%m-%d")
      (df, date_format(expr, Strftime.toJavaTime(fmt)))
    case "truncate" =>
      (df, substring(expr, 1, t.num("length").getOrElse(10.0).toInt))
    case "scale" =>
      (df, expr * lit(t.num("factor").getOrElse(1.0)))
    case "normalize" =>
      val (mn, mx) = (fresh("min"), fresh("max"))
      val stats = df.agg(min(expr).as(mn), max(expr).as(mx))
      (df.crossJoin(broadcast(stats)),
        (expr - col(mn)) / (col(mx) - col(mn)))
    case "standardize" =>
      val (av, sd) = (fresh("avg"), fresh("std"))
      val stats = df.agg(avg(expr).as(av), stddev(expr).as(sd))
      (df.crossJoin(broadcast(stats)), (expr - col(av)) / col(sd))
    case "convert_timezone" =>
      val from = t.str("from").orElse(t.str("from_tz")).getOrElse("UTC")
      val to = t.str("to").orElse(t.str("to_tz")).getOrElse("UTC")
      (df, convert_timezone(lit(from), lit(to), expr))
    case "strip" => (df, trim(expr))
    case "to_numeric" =>
      // DuckDB CAST(x AS DECIMAL) defaults to DECIMAL(18,3)
      (df, expr.cast(DecimalType(18, 3)))
    case "to_datetime" =>
      val fmt = t.str("format").getOrElse("%Y-%m-%d")
      (df, to_timestamp(expr, Strftime.toJavaTime(fmt)))
    case "replace" =>
      val oldV = t.str("old_value").getOrElse(
        throw new IllegalArgumentException("replace requires 'old_value'"))
      val newV = t.str("new_value").getOrElse("")
      (df, replace(expr, lit(oldV), lit(newV)))
    case "extract" =>
      val pat = t.str("pattern").getOrElse(
        throw new IllegalArgumentException("extract requires 'pattern'"))
      // DuckDB REGEXP_SUBSTR yields NULL on no match; Spark regexp_extract
      // yields '' — nullif aligns the semantics (SURVEY.md §2.4 T17).
      (df, nullif(regexp_extract(expr, pat, 0), lit("")))
    case "pad" =>
      val width = t.num("width").getOrElse(10.0).toInt
      val padChar = t.str("pad_char").getOrElse(" ")
      val side = t.str("side").getOrElse("left")
      (df, if (side.equalsIgnoreCase("left")) lpad(expr, width, padChar)
           else rpad(expr, width, padChar))
    case "clip" =>
      val lo = t.num("lower").getOrElse(
        throw new IllegalArgumentException("clip requires 'lower'"))
      val hi = t.num("upper").getOrElse(
        throw new IllegalArgumentException("clip requires 'upper'"))
      (df, least(greatest(expr, lit(lo)), lit(hi)))
    case "bin" =>
      val bins = t.list("bins").map {
        case n: Number => n.doubleValue()
        case s         => s.toString.toDouble
      }
      val labels = t.list("labels").map(_.toString)
      require(bins.nonEmpty && labels.nonEmpty && bins.length == labels.length + 1,
        "Bins and labels lengths do not match the expected configuration.")
      val cased = labels.indices.foldLeft(Option.empty[Column]) { (acc, i) =>
        val cond = expr >= lit(bins(i)) && expr < lit(bins(i + 1))
        Some(acc.fold(when(cond, lit(labels(i))))(_.when(cond, lit(labels(i)))))
      }.get
      // reference CASE mixes string labels with the raw value in ELSE —
      // unify to string explicitly rather than rely on coercion order
      (df, cased.otherwise(expr.cast("string")))
    case "validate_email" =>
      val re = "^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$"
      (df, when(expr.rlike(re), expr))
    case "validate_date_range" =>
      val start = t.str("start_date").getOrElse(
        throw new IllegalArgumentException("validate_date_range requires 'start_date'"))
      val end = t.str("end_date").getOrElse(
        throw new IllegalArgumentException("validate_date_range requires 'end_date'"))
      (df, when(expr.between(lit(start), lit(end)), expr))
    case "normalize_phone" =>
      val cc = t.str("country_code").getOrElse("+1")
      (df, concat(lit(cc), regexp_replace(expr, "[^0-9]", "")))
    case "validate_foreign_key" =>
      val refTable = t.str("ref_table").getOrElse(
        throw new IllegalArgumentException("validate_foreign_key requires 'ref_table'"))
      val refColumn = t.str("ref_column").getOrElse(
        throw new IllegalArgumentException("validate_foreign_key requires 'ref_column'"))
      val marker = fresh("fk")
      val refKeys = resolveTable(refTable)
        .select(col(refColumn).as(marker)).distinct()
      val joined = df.join(refKeys, expr === col(marker), "left")
      (joined, when(col(marker).isNotNull, expr))
    case "ensure_positive" => (df, when(expr > 0, expr))
    case "standardize_categories" =>
      val m = t.mapping
      if (m.isEmpty) (df, expr)
      else {
        val cased = m.foldLeft(Option.empty[Column]) { case (acc, (k, v)) =>
          val cond = lower(expr) === lower(lit(k))
          Some(acc.fold(when(cond, lit(v)))(_.when(cond, lit(v))))
        }.get
        (df, cased.otherwise(expr))
      }
    case "rename" =>
      // handled at projection level (alias); reference emits a string
      // literal alias — we implement the intent (SURVEY.md §7.4)
      (df, expr)
    case "remove_duplicates" => (df, expr) // plan-level DISTINCT
    case other => throw new UnsupportedTransformationError(other)
  }

  /** Fold a column's transformation chain in declaration order; matching is
    * case-insensitive on column name. */
  def applyColumn(
      df: DataFrame,
      columnName: String,
      expr: Column,
      all: Seq[TransformDef],
      resolveTable: String => DataFrame,
  ): (DataFrame, Column) =
    forColumn(columnName, all).foldLeft((df, expr)) { case ((d, e), t) =>
      applyOne(d, e, t, resolveTable)
    }

  def forColumn(columnName: String, all: Seq[TransformDef]): Seq[TransformDef] =
    all.filter(_.column.exists(_.equalsIgnoreCase(columnName)))

  /** rename's target name, if the chain has one. */
  def renameTarget(columnName: String, all: Seq[TransformDef]): Option[String] =
    forColumn(columnName, all).filter(_.ttype == "rename")
      .flatMap(_.str("new_name")).lastOption

  def hasRemoveDuplicates(all: Seq[TransformDef]): Boolean =
    all.exists(_.ttype == "remove_duplicates")
}
