package graft.types

import org.apache.spark.sql.types._

/** The reference declares exactly five column types
  * (reference: pandasai/constants.py:49, semantic_layer_schema.py:55-62).
  * Mapping chosen per SURVEY.md §1.2.
  */
object TypeMapping {
  val valid: Set[String] = Set("string", "integer", "float", "datetime", "boolean")

  def toSpark(t: String): DataType = t match {
    case "string"   => StringType
    case "integer"  => LongType
    case "float"    => DoubleType
    case "datetime" => TimestampType
    case "boolean"  => BooleanType
    case other => throw new IllegalArgumentException(
      s"Unsupported column type: $other (must be one of ${valid.mkString(", ")})")
  }

  /** Inverse mapping used when synthesizing a schema from an existing
    * DataFrame (reference: pandasai/dataframe/base.py:157-173).
    */
  def fromSpark(dt: DataType): String = dt match {
    case StringType | VarcharType(_) | CharType(_)          => "string"
    case ByteType | ShortType | IntegerType | LongType      => "integer"
    case FloatType | DoubleType | _: DecimalType            => "float"
    case TimestampType | DateType | TimestampNTZType        => "datetime"
    case BooleanType                                        => "boolean"
    case _                                                  => "string"
  }
}

/** strftime → java.time (Spark datetime pattern) token translation.
  *
  * The reference emits DuckDB `DATE_FORMAT(x, '%Y-%m-%d')` /
  * `STR_TO_DATE(x, '%Y-%m-%d')` (reference:
  * pandasai/query_builders/sql_transformation_manager.py:97-102,140-144);
  * Spark's `date_format`/`to_timestamp` take java.time patterns, so the
  * format string is translated as a pure function — no custom Expression
  * needed (SURVEY.md §7.3).
  */
object Strftime {
  private val tokens: Map[Char, String] = Map(
    'Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'd' -> "dd",
    'H' -> "HH", 'I' -> "hh", 'M' -> "mm", 'S' -> "ss",
    'f' -> "SSSSSS", 'p' -> "a", 'j' -> "DDD",
    'a' -> "EEE", 'A' -> "EEEE", 'b' -> "MMM", 'B' -> "MMMM",
    'e' -> "d", 'Z' -> "zzz",
  )

  // ISO week-based directives translate to java.time letters (Y/w/e)
  // that Spark has BANNED since 3.0 — a mapping would always throw at
  // action time, so reject eagerly with a clear message instead.
  private val weekBased: Set[Char] = Set('G', 'V', 'u', 'U', 'W')

  /** Translate a strftime pattern to a java.time pattern. Literal runs
    * containing letters are single-quoted (java.time treats bare letters
    * as pattern tokens); unknown %-directives pass through literally.
    */
  def toJavaTime(fmt: String): String = {
    val out = new StringBuilder
    val lit = new StringBuilder
    def flush(): Unit = {
      if (lit.nonEmpty) {
        // quote only the letter-bearing sub-runs (java.time treats bare
        // letters as pattern tokens); spaces/punctuation stay unquoted
        for (run <- "[A-Za-z']+|[^A-Za-z']+".r.findAllIn(lit.toString)) {
          if (run.exists(c => c.isLetter || c == '\''))
            out ++= "'" + run.replace("'", "''") + "'"
          else out ++= run
        }
        lit.clear()
      }
    }
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        val d = fmt.charAt(i + 1)
        if (d == '%') { lit += '%'; i += 2 }
        else if (weekBased(d)) throw new UnsupportedOperationException(
          s"strftime %$d is week-based; Spark rejects week-based datetime " +
            "patterns since 3.0, so this directive cannot be supported")
        else tokens.get(d) match {
          case Some(jt) => flush(); out ++= jt; i += 2
          case None     => lit += c; lit += d; i += 2
        }
      } else { lit += c; i += 1 }
    }
    flush()
    out.toString
  }
}
