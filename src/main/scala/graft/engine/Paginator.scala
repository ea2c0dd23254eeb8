package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pagination over any frame: search-across-columns with per-type
  * predicates, JSON-style column filters, sort, and LIMIT/OFFSET
  * (reference: pandasai/helpers/paginator.py:75-204).
  *
  * Scale note: `offset` + `limit` push into the plan (Spark 3.4+
  * GlobalLimit/Offset); the sort is the only shuffle and is required by
  * the semantics.
  */
object Paginator {

  final case class Params(
      page: Int = 0,
      pageSize: Int = 20,
      search: Option[String] = None,
      filters: Map[String, Seq[Any]] = Map.empty,
      sortBy: Option[String] = None,
      sortOrder: String = "asc",
  )

  def paginate(df: DataFrame, p: Params): DataFrame = {
    val searched = p.search.filter(_.nonEmpty).fold(df) { term =>
      val preds = df.schema.fields.flatMap(f => searchPredicate(f, term))
      if (preds.isEmpty) df else df.filter(preds.reduce(_ || _))
    }
    val filtered = p.filters.foldLeft(searched) { case (d, (column, values)) =>
      if (values.isEmpty) d else d.filter(col(column).isin(values: _*))
    }
    val sorted = p.sortBy.fold(filtered) { s =>
      val c = if (p.sortOrder.equalsIgnoreCase("desc")) col(s).desc else col(s).asc
      filtered.orderBy(c)
    }
    sorted.offset(p.page * p.pageSize).limit(p.pageSize)
  }

  /** Typed search predicate per column, mirroring paginator.py:113-184:
    * strings match case-insensitively by substring (ILIKE '%term%'),
    * numerics match on exact value when the term parses, others skipped.
    */
  private def searchPredicate(f: StructField, term: String): Option[Column] =
    f.dataType match {
      case StringType =>
        Some(col(f.name).ilike(s"%${escapeLike(term)}%"))
      case ByteType | ShortType | IntegerType | LongType =>
        term.toLongOption.map(v => col(f.name) === lit(v))
      case FloatType | DoubleType | _: DecimalType =>
        term.toDoubleOption.map(v => col(f.name) === lit(v))
      case BooleanType =>
        term.toBooleanOption.map(v => col(f.name) === lit(v))
      case _ => None
    }

  private def escapeLike(s: String): String =
    s.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
}
