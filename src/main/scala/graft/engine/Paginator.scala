package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pagination over any frame: search-across-columns with per-type
  * predicates, JSON-style column filters, sort, and LIMIT/OFFSET
  * (reference: pandasai/query_builders/paginator.py:75-204 with the
  * parameter contract of PaginationParams, ibid. 12-35).
  *
  * Parity notes:
  *  - `page` is 1-based and `pageSize` capped at 100, as in the
  *    reference's validated params (`page ge=1`, `page_size le=100`);
  *  - `sortOrder` accepts exactly `asc`/`desc` (reference pattern
  *    `^(asc|desc)$`);
  *  - search/sort/filter params are screened for SQL fragments before
  *    use (reference `not_sql` validator → is_sql_query,
  *    helpers/sql_sanitizer.py:114-134) — defense-in-depth only here,
  *    since predicates are built with the Column API and never spliced
  *    into SQL text;
  *  - search matches string columns by ILIKE substring, integer columns
  *    by equality when the term is all digits (reference `.isnumeric()`),
  *    float columns when it parses as a float, boolean on true/false,
  *    timestamp columns when the term parses as `yyyy-MM-dd HH:mm:ss`
  *    (reference is_valid_datetime). The reference's `uuid` branch has no
  *    Spark counterpart (UUIDs land as strings and take the ILIKE path).
  *
  * Scale note: `offset` + `limit` push into the plan (GlobalLimit/
  * Offset → TakeOrderedAndProject with the sort); the sort is the only
  * shuffle and is required by the semantics.
  */
object Paginator {

  final case class Params(
      page: Int = 1,
      pageSize: Int = 20,
      search: Option[String] = None,
      filters: Map[String, Seq[Any]] = Map.empty,
      sortBy: Option[String] = None,
      sortOrder: String = "asc",
  )

  /** SQL-fragment screen on pagination params (is_sql_query patterns,
    * sql_sanitizer.py:114-134). */
  private val sqlPatterns: Seq[scala.util.matching.Regex] = Seq(
    "(?i)\\bSELECT\\b.*\\bFROM\\b", "(?i)\\bINSERT\\b.*\\bINTO\\b",
    "(?i)\\bUPDATE\\b.*\\bSET\\b", "(?i)\\bDELETE\\b.*\\bFROM\\b",
    "(?i)\\bDROP\\b.*\\b(TABLE|DATABASE)\\b",
    "(?i)\\bCREATE\\b.*\\b(DATABASE|TABLE)\\b",
    "(?i)\\bALTER\\b.*\\bTABLE\\b", "(?i)\\bJOIN\\b.*\\bON\\b",
    "(?i)\\bWHERE\\b").map(_.r)

  private def looksLikeSql(s: String): Boolean =
    sqlPatterns.exists(_.findFirstIn(s).isDefined)

  private def validate(df: DataFrame, p: Params): Unit = {
    require(p.page >= 1, s"page must be >= 1 (1-based), got ${p.page}")
    require(p.pageSize >= 1 && p.pageSize <= 100,
      s"pageSize must be in [1, 100], got ${p.pageSize}")
    require(p.sortOrder == "asc" || p.sortOrder == "desc",
      s"sortOrder must be 'asc' or 'desc', got '${p.sortOrder}'")
    val paramStrings =
      p.search.toSeq ++ p.sortBy.toSeq ++
        p.filters.keys ++ p.filters.values.flatten.collect { case s: String => s }
    paramStrings.find(looksLikeSql).foreach { bad =>
      throw new IllegalArgumentException(
        s"SQL queries are not allowed in pagination parameters: $bad")
    }
    p.sortBy.foreach { s =>
      if (!df.columns.contains(s))
        throw new IllegalArgumentException(
          s"Sort column '$s' not found in available columns")
    }
  }

  def paginate(df: DataFrame, p: Params): DataFrame = {
    validate(df, p)
    val searched = p.search.filter(_.nonEmpty).fold(df) { term =>
      val preds = df.schema.fields.flatMap(f => searchPredicate(f, term))
      if (preds.isEmpty) df else df.filter(preds.reduce(_ || _))
    }
    val filtered = p.filters.foldLeft(searched) { case (d, (column, values)) =>
      if (values.isEmpty) d else d.filter(col(column).isin(values: _*))
    }
    val sorted = p.sortBy.fold(filtered) { s =>
      val c = if (p.sortOrder == "desc") col(s).desc else col(s).asc
      filtered.orderBy(c)
    }
    sorted.offset((p.page - 1) * p.pageSize).limit(p.pageSize)
  }

  /** Filters arriving as a JSON object string (the reference's `filters`
    * param): `{"col": [v1, v2]}` or `{"col": v}` — scalars become
    * singleton lists (paginator.py:166-180); invalid JSON throws. */
  def parseFilters(json: String): Map[String, Seq[Any]] = {
    import scala.jdk.CollectionConverters._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root =
      try mapper.readTree(json)
      catch {
        case e: com.fasterxml.jackson.core.JacksonException =>
          throw new IllegalArgumentException(s"Invalid filters format: ${e.getMessage}")
      }
    if (root == null || !root.isObject)
      throw new IllegalArgumentException("Invalid filters format: expected a JSON object")
    def scalar(n: com.fasterxml.jackson.databind.JsonNode): Any =
      if (n.isNull) null // IN (NULL) matches nothing, like the reference's SQL
      else if (n.isIntegralNumber) n.asLong()
      else if (n.isNumber) n.asDouble()
      else if (n.isBoolean) n.asBoolean()
      else n.asText()
    root.fields().asScala.map { e =>
      val values: Seq[Any] =
        if (e.getValue.isArray) e.getValue.elements().asScala.map(scalar).toSeq
        else Seq(scalar(e.getValue))
      e.getKey -> values
    }.toMap
  }

  /** Typed search predicate per column (paginator.py:113-160). */
  private def searchPredicate(f: StructField, term: String): Option[Column] =
    f.dataType match {
      case StringType =>
        Some(col(f.name).ilike(s"%${escapeLike(term)}%"))
      case ByteType | ShortType | IntegerType | LongType =>
        // reference: `.isnumeric()` — digits only, no sign/decimal
        if (term.nonEmpty && term.forall(_.isDigit)) term.toLongOption.map(v => col(f.name) === lit(v))
        else None
      case FloatType | DoubleType | _: DecimalType =>
        term.toDoubleOption.map(v => col(f.name) === lit(v))
      case BooleanType =>
        term.toBooleanOption.map(v => col(f.name) === lit(v))
      case TimestampType =>
        // parse INSIDE the plan (to_timestamp) so the literal is
        // interpreted in spark.sql.session.timeZone — a driver-side
        // java.sql.Timestamp would use the JVM default zone and match
        // the wrong instant whenever the two differ
        parseDateTime(term).map(_ =>
          col(f.name) === to_timestamp(lit(term), "yyyy-MM-dd HH:mm:ss"))
      case TimestampNTZType =>
        // NTZ values are wall-clock: a LocalDateTime literal compares
        // zone-free on both sides
        parseDateTime(term).map(ldt => col(f.name) === lit(ldt))
      case _ => None
    }

  /** Strict `yyyy-MM-dd HH:mm:ss` (reference is_valid_datetime strptime
    * format, paginator.py:66-72). */
  private def parseDateTime(term: String): Option[java.time.LocalDateTime] =
    try {
      val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
      Some(java.time.LocalDateTime.parse(term, fmt))
    } catch { case _: java.time.format.DateTimeParseException => None }

  private def escapeLike(s: String): String =
    s.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
}
