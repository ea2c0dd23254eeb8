package graft.schema

import java.util.{List => JList, Map => JMap}
import scala.jdk.CollectionConverters._
import org.yaml.snakeyaml.Yaml
import graft.types.TypeMapping

/** Semantic-layer schema model, mirroring the reference's pydantic
  * `SemanticLayerSchema` (reference:
  * pandasai/data_loader/semantic_layer_schema.py:270-301) as a Scala
  * case-class tree parsed from schema.yaml with snakeyaml.
  */
final case class ColumnDef(
    name: String,
    ctype: Option[String] = None,
    description: Option[String] = None,
    expression: Option[String] = None,
    alias: Option[String] = None,
)

/** Join edge in `dataset.column` form
  * (reference: semantic_layer_schema.py:76-84). */
final case class RelationDef(
    name: Option[String],
    description: Option[String],
    from: String,
    to: String,
)

/** One of the 29 named transformations + params
  * (reference: semantic_layer_schema.py:87-195, constants.py:51-81). */
final case class TransformDef(ttype: String, params: Map[String, Any]) {
  def column: Option[String] =
    params.get("column").map(_.toString)
  def str(key: String): Option[String] =
    params.get(key).filter(_ != null).map(_.toString)
  def num(key: String): Option[Double] = params.get(key).flatMap {
    case n: Number => Some(n.doubleValue())
    case s: String => s.toDoubleOption
    case _         => None
  }
  def mapping: Map[String, String] = params.get("mapping") match {
    case Some(m: JMap[_, _]) =>
      m.asScala.map { case (k, v) => k.toString -> v.toString }.toMap
    case Some(m: Map[_, _]) =>
      m.map { case (k, v) => k.toString -> v.toString }
    case _ => Map.empty
  }
  def list(key: String): Seq[Any] = params.get(key) match {
    case Some(l: JList[_]) => l.asScala.toSeq
    case Some(l: Seq[_])   => l
    case _                 => Seq.empty
  }
}

/** `{type, path}` (csv/parquet) or `{type, connection, table}`
  * (reference: semantic_layer_schema.py:198-254, constants.py:23-48). */
final case class SourceDef(
    stype: String,
    path: Option[String] = None,
    table: Option[String] = None,
    connection: Map[String, String] = Map.empty,
)

object SourceDef {
  val localTypes: Set[String] = Set("csv", "parquet")
  val remoteTypes: Set[String] = Set(
    "mysql", "postgres", "cockroachdb", "sqlserver", "sqlite",
    "bigquery", "snowflake", "databricks", "oracle", "yahoo_finance")
}

/** Declared output sink, csv/parquet only
  * (reference: semantic_layer_schema.py:257-267). */
final case class DestinationDef(dtype: String, format: String, path: String)

final case class SemanticSchema(
    name: String,
    description: Option[String] = None,
    source: Option[SourceDef] = None,
    view: Boolean = false,
    columns: Seq[ColumnDef] = Seq.empty,
    relations: Seq[RelationDef] = Seq.empty,
    transformations: Seq[TransformDef] = Seq.empty,
    groupBy: Seq[String] = Seq.empty,
    orderBy: Seq[String] = Seq.empty,
    limit: Option[Int] = None,
    destination: Option[DestinationDef] = None,
) {
  /** Validation rules mirroring semantic_layer_schema.py:303-394. */
  def validate(): SemanticSchema = {
    require(name != null && name.nonEmpty, "schema must have a name")
    require(
      name.matches("^[a-zA-Z0-9_-]+$"),
      s"invalid schema name '$name' (alphanumeric, dash, underscore only)")
    // single source xor view (:348-351)
    require(source.isDefined ^ view,
      "schema must have exactly one of: a source, or view=true")
    if (view) {
      require(source.isEmpty, "a view cannot also declare a source")
      // view columns must be `dataset.column` (:333-347)
      columns.foreach { c =>
        require(
          c.name.matches("^[a-zA-Z0-9_-]+\\.[a-zA-Z0-9_-]+$"),
          s"view column '${c.name}' must be in 'dataset.column' format")
      }
      // every dataset referenced by a relation side must appear in columns'
      // dataset set, and multi-dataset views need relations (:352-394)
      val colDatasets = columns.map(_.name.split("\\.")(0)).toSet
      val relDatasets =
        relations.flatMap(r => Seq(r.from.split("\\.")(0), r.to.split("\\.")(0))).toSet
      if (colDatasets.size > 1)
        require(relations.nonEmpty,
          "a view over multiple datasets requires relations")
      relations.foreach { r =>
        require(r.from.contains(".") && r.to.contains("."),
          s"relation sides must be 'dataset.column': ${r.from} -> ${r.to}")
      }
      require(relDatasets.subsetOf(colDatasets) || colDatasets.subsetOf(relDatasets) || relDatasets.isEmpty,
        "relations reference datasets absent from the view's columns")
    } else {
      columns.foreach { c =>
        require(!c.name.contains(" "), s"invalid column name '${c.name}'")
      }
    }
    columns.foreach { c =>
      c.ctype.foreach { t =>
        require(TypeMapping.valid.contains(t),
          s"column '${c.name}' has invalid type '$t' (${TypeMapping.valid.mkString(", ")})")
      }
    }
    // group_by × expression exclusivity (:316-331): with group_by present,
    // every declared column must either be one of the grouping keys or carry
    // an (aggregate) expression.
    if (groupBy.nonEmpty) {
      val keys = groupBy.map(_.toLowerCase).toSet
      columns.foreach { c =>
        require(
          keys.contains(c.name.toLowerCase) || c.expression.isDefined,
          s"column '${c.name}' must be either in group_by or aggregated via an expression")
      }
    }
    transformations.foreach { t =>
      require(Transformations.validTypes.contains(t.ttype),
        s"unsupported transformation type: ${t.ttype}")
    }
    destination.foreach { d =>
      require(Set("csv", "parquet").contains(d.format),
        s"destination format must be csv or parquet, got ${d.format}")
    }
    this
  }
}

/** The 29 declared transformation names (reference: constants.py:51-81).
  * Note `encode_categorical` is declared valid but unimplemented in the
  * reference's SQL path — building it raises (sql_transformation_manager
  * .py:43-47); we reproduce that error behavior at plan-build time.
  */
object Transformations {
  val validTypes: Set[String] = Set(
    "anonymize", "fill_na", "map_values", "to_lowercase", "to_uppercase",
    "round_numbers", "format_date", "truncate", "scale", "normalize",
    "standardize", "convert_timezone", "strip", "to_numeric", "to_datetime",
    "replace", "extract", "pad", "clip", "bin", "validate_email",
    "validate_date_range", "normalize_phone", "remove_duplicates",
    "validate_foreign_key", "ensure_positive", "standardize_categories",
    "rename", "encode_categorical")
}

object SemanticSchema {

  /** Parse a schema.yaml document (reference round-trip:
    * semantic_layer_schema.py:396-400). */
  def fromYaml(text: String): SemanticSchema = {
    val root = new Yaml().load[JMap[String, Any]](text)
    fromJava(root)
  }

  def fromJava(root: JMap[String, Any]): SemanticSchema = {
    val m = Option(root).map(_.asScala).getOrElse(
      throw new IllegalArgumentException("empty schema.yaml"))
    def getStr(k: String): Option[String] =
      m.get(k).filter(_ != null).map(_.toString)
    def getMap(v: Any): Map[String, Any] = v match {
      case jm: JMap[_, _] => jm.asScala.map { case (k, x) => k.toString -> x }.toMap
      case _              => Map.empty
    }
    def getList(k: String): Seq[Map[String, Any]] = m.get(k) match {
      case Some(l: JList[_]) => l.asScala.toSeq.map(getMap)
      case _                 => Seq.empty
    }
    def getStrList(k: String): Seq[String] = m.get(k) match {
      case Some(l: JList[_]) => l.asScala.toSeq.map(_.toString)
      case _                 => Seq.empty
    }

    val source = m.get("source").map(getMap).map { s =>
      SourceDef(
        stype = s.get("type").map(_.toString).getOrElse(
          throw new IllegalArgumentException("source requires a type")),
        path = s.get("path").map(_.toString),
        table = s.get("table").map(_.toString),
        connection = s.get("connection").map(getMap).getOrElse(Map.empty)
          .map { case (k, v) => k -> String.valueOf(v) },
      )
    }
    val columns = getList("columns").map { c =>
      ColumnDef(
        name = c.getOrElse("name",
          throw new IllegalArgumentException("column requires a name")).toString,
        ctype = c.get("type").filter(_ != null).map(_.toString),
        description = c.get("description").filter(_ != null).map(_.toString),
        expression = c.get("expression").filter(_ != null).map(_.toString),
        alias = c.get("alias").filter(_ != null).map(_.toString),
      )
    }
    val relations = getList("relations").map { r =>
      RelationDef(
        name = r.get("name").filter(_ != null).map(_.toString),
        description = r.get("description").filter(_ != null).map(_.toString),
        from = r.getOrElse("from",
          throw new IllegalArgumentException("relation requires 'from'")).toString,
        to = r.getOrElse("to",
          throw new IllegalArgumentException("relation requires 'to'")).toString,
      )
    }
    val transformations = getList("transformations").map { t =>
      TransformDef(
        ttype = t.getOrElse("type",
          throw new IllegalArgumentException("transformation requires a type")).toString,
        params = t.get("params").map(getMap).getOrElse(Map.empty),
      )
    }
    val destination = m.get("destination").map(getMap).map { d =>
      DestinationDef(
        dtype = d.get("type").map(_.toString).getOrElse("local"),
        format = d.get("format").map(_.toString).getOrElse("parquet"),
        path = d.get("path").map(_.toString).getOrElse(
          throw new IllegalArgumentException("destination requires a path")),
      )
    }
    SemanticSchema(
      name = getStr("name").getOrElse(
        throw new IllegalArgumentException("schema requires a name")),
      description = getStr("description"),
      source = source,
      view = m.get("view").exists {
        case b: java.lang.Boolean => b
        case s => s.toString.toBoolean
      },
      columns = columns,
      relations = relations,
      transformations = transformations,
      groupBy = getStrList("group_by"),
      orderBy = getStrList("order_by"),
      limit = m.get("limit").filter(_ != null).map {
        case n: Number => n.intValue()
        case s         => s.toString.toInt
      },
      destination = destination,
    ).validate()
  }

  /** Emit schema.yaml (used by the dataset store, `Engine.create`). */
  def toYaml(s: SemanticSchema): String = {
    val sb = new StringBuilder
    // YAML-reserved scalars ("true", "no", "null", "~", numbers like
    // "123"/"1.5"/".5") would round-trip through fromYaml as bool/null/
    // number, corrupting a string field — always force-quote those.
    val yamlReserved = "(?i)^(true|false|yes|no|on|off|null|~)$".r
    val yamlNumeric = "^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$".r
    def quote(v: String): String =
      if (v.matches("^[a-zA-Z0-9_./ -]+$") && v.nonEmpty &&
        yamlReserved.findFirstIn(v.trim).isEmpty &&
        yamlNumeric.findFirstIn(v.trim).isEmpty) v
      else "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    sb ++= s"name: ${quote(s.name)}\n"
    s.description.foreach(d => sb ++= s"description: ${quote(d)}\n")
    s.source.foreach { src =>
      sb ++= "source:\n"
      sb ++= s"  type: ${src.stype}\n"
      src.path.foreach(p => sb ++= s"  path: ${quote(p)}\n")
      src.table.foreach(t => sb ++= s"  table: ${quote(t)}\n")
      if (src.connection.nonEmpty) {
        sb ++= "  connection:\n"
        src.connection.foreach { case (k, v) => sb ++= s"    $k: ${quote(v)}\n" }
      }
    }
    if (s.view) sb ++= "view: true\n"
    if (s.columns.nonEmpty) {
      sb ++= "columns:\n"
      s.columns.foreach { c =>
        sb ++= s"- name: ${quote(c.name)}\n"
        c.ctype.foreach(t => sb ++= s"  type: $t\n")
        c.description.foreach(d => sb ++= s"  description: ${quote(d)}\n")
        c.expression.foreach(e => sb ++= s"  expression: ${quote(e)}\n")
        c.alias.foreach(a => sb ++= s"  alias: ${quote(a)}\n")
      }
    }
    if (s.relations.nonEmpty) {
      sb ++= "relations:\n"
      s.relations.foreach { r =>
        sb ++= s"- from: ${quote(r.from)}\n"
        sb ++= s"  to: ${quote(r.to)}\n"
      }
    }
    if (s.transformations.nonEmpty) {
      sb ++= "transformations:\n"
      s.transformations.foreach { t =>
        sb ++= s"- type: ${t.ttype}\n"
        if (t.params.nonEmpty) {
          sb ++= "  params:\n"
          // normalize snakeyaml's java collections so a loaded schema
          // round-trips (java.util.Map/List would fall into the generic
          // toString case and corrupt the emitted YAML)
          def normalize(v: Any): Any = v match {
            case jm: JMap[_, _] =>
              jm.asScala.map { case (k2, v2) => k2.toString -> v2 }.toMap
            case jl: JList[_] => jl.asScala.toSeq
            case other        => other
          }
          t.params.foreach { case (k, raw) =>
            normalize(raw) match {
              case v: Number  => sb ++= s"    $k: $v\n"
              case v: Boolean => sb ++= s"    $k: $v\n"
              case v: Map[_, _] =>
                sb ++= s"    $k:\n"
                v.foreach { case (mk, mv) => sb ++= s"      $mk: ${quote(String.valueOf(mv))}\n" }
              case v: Seq[_] =>
                sb ++= v.map(x => String.valueOf(x))
                  .mkString(s"    $k:\n    - ", "\n    - ", "\n")
              case v => sb ++= s"    $k: ${quote(String.valueOf(v))}\n"
            }
          }
        }
      }
    }
    if (s.groupBy.nonEmpty)
      sb ++= s.groupBy.map(quote).mkString("group_by:\n- ", "\n- ", "\n")
    if (s.orderBy.nonEmpty)
      sb ++= s.orderBy.map(quote).mkString("order_by:\n- ", "\n- ", "\n")
    s.limit.foreach(n => sb ++= s"limit: $n\n")
    s.destination.foreach { d =>
      sb ++= s"destination:\n  type: ${d.dtype}\n  format: ${d.format}\n  path: ${quote(d.path)}\n"
    }
    sb.toString
  }
}
