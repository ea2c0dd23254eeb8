package graft.engine

import java.nio.file.{Files, Paths}
import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.plan.DatasetPlanBuilder
import graft.schema._
import graft.types.TypeMapping

/** The engine facade: dataset store (create/load), temp-view registry, and
  * the `executeSqlQuery` entry point all generated code must call
  * (reference: pandasai/agent/base.py:137-169, pandasai/__init__.py:46-291,
  * pandasai/data_loader/loader.py:38-69).
  *
  * Datasets live under `datasetsRoot/org/name/{schema.yaml,data.parquet}`
  * exactly like the reference's `datasets/` layout. Loading is LAZY: a
  * loaded dataset is a composed logical plan, materialized only by an
  * action — the Spark-idiomatic improvement over the reference's eager
  * `LocalDatasetLoader.load` (local_loader.py:35-41).
  */
final class Engine(val spark: SparkSession, val datasetsRoot: String) {

  private val registry = mutable.LinkedHashMap.empty[String, DataFrame]
  private val schemas = mutable.LinkedHashMap.empty[String, SemanticSchema]

  def knownTables: Set[String] = registry.keySet.toSet

  /** Register an in-memory frame as a queryable table
    * (reference: data_loader/duck_db_connection_manager.py:18-27). */
  def register(name: String, df: DataFrame): Unit = {
    val clean = SqlGate.sanitizeTableNameLowercase(name)
    registry(clean) = df
    df.createOrReplaceTempView(clean)
  }

  def table(name: String): DataFrame =
    registry.getOrElse(SqlGate.sanitizeTableNameLowercase(name),
      throw new IllegalArgumentException(s"unknown table: $name"))

  /** `pai.create` for a materialized frame: write data.parquet +
    * schema.yaml, then reload through the loader
    * (reference: pandasai/__init__.py:46-208). */
  def create(path: String, df: DataFrame, description: Option[String] = None): DataFrame = {
    val (org, name) = splitPath(path)
    val dir = Paths.get(datasetsRoot, org, name)
    Files.createDirectories(dir)
    df.write.mode("overwrite").parquet(dir.resolve("data.parquet").toString)
    val schema = SemanticSchema(
      name = name,
      description = description,
      source = Some(SourceDef("parquet", path = Some("data.parquet"))),
      columns = df.schema.fields.map(f =>
        ColumnDef(f.name, ctype = Some(TypeMapping.fromSpark(f.dataType)))),
    ).validate()
    Files.writeString(dir.resolve("schema.yaml"), SemanticSchema.toYaml(schema))
    load(path)
  }

  /** `pai.create` for a declared source or view schema. */
  def createFromSchema(path: String, schema: SemanticSchema): DataFrame = {
    val (org, name) = splitPath(path)
    val dir = Paths.get(datasetsRoot, org, name)
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("schema.yaml"), SemanticSchema.toYaml(schema.validate()))
    load(path)
  }

  /** `pai.load("org/dataset")`: parse schema.yaml → compiled lazy plan →
    * registered as a temp view for L2 SQL
    * (reference: pandasai/__init__.py:259-291). */
  def load(path: String): DataFrame = {
    val (org, name) = splitPath(path)
    val dir = Paths.get(datasetsRoot, org, name)
    val schemaFile = dir.resolve("schema.yaml")
    if (!Files.exists(schemaFile))
      throw new IllegalArgumentException(
        s"dataset not found: $path (no ${schemaFile.toString}) — create it " +
          "with Engine.create or check the org/dataset path")
    val schema = SemanticSchema.fromYaml(Files.readString(schemaFile))
    val df = DatasetPlanBuilder.build(spark, schema, dir.toString, resolveDependency(org))
    schemas(SqlGate.sanitizeTableNameLowercase(schema.name)) = schema
    register(schema.name, df)
    schema.destination.foreach(dest => writeDestination(df, dest))
    df
  }

  // datasets currently being resolved — a view dependency chain that
  // loops (a → b → a) must fail with the cycle spelled out, not
  // overflow the stack
  private val loading = mutable.LinkedHashSet.empty[String]

  /** Views resolve sibling datasets within the same org, falling back to
    * already-registered tables
    * (reference: data_loader/view_loader.py:43-71). */
  private def resolveDependency(org: String)(dep: String): DataFrame = {
    val clean = SqlGate.sanitizeTableNameLowercase(dep)
    registry.getOrElse(clean, {
      val depDir = Paths.get(datasetsRoot, org, dep, "schema.yaml")
      if (Files.exists(depDir)) {
        if (loading.contains(clean))
          throw new IllegalArgumentException(
            s"circular view dependency: ${(loading.toSeq :+ clean).mkString(" -> ")}")
        loading += clean
        try load(s"$org/$dep") finally loading -= clean
      }
      else throw new IllegalArgumentException(s"unknown view dependency: $dep")
    })
  }

  /** Declared sink (reference: semantic_layer_schema.py:257-267). */
  def writeDestination(df: DataFrame, dest: DestinationDef): Unit = dest.format match {
    case "parquet" => df.write.mode("overwrite").parquet(dest.path)
    case "csv" => df.write.mode("overwrite").option("header", "true").csv(dest.path)
    case other => throw new IllegalArgumentException(s"unsupported destination format: $other")
  }

  /** THE single query entry point for generated code
    * (reference: pandasai/agent/base.py:137-169): gate the SQL
    * (SELECT-only + known-tables whitelist), then hand it to Catalyst.
    * Table refs resolve against the registered temp views — no string
    * rewriting needed.
    */
  def executeSqlQuery(sql: String): DataFrame = {
    SqlGate.checkTables(spark, sql, knownTables)
    spark.sql(sql)
  }

  /** Lazy head/row-count, the VirtualDataFrame surface
    * (reference: pandasai/dataframe/virtual_dataframe.py:15-51). */
  def head(name: String, n: Int = 5): DataFrame = table(name).limit(n)
  def rowCount(name: String): Long = table(name).count()

  def schemaOf(name: String): Option[SemanticSchema] =
    schemas.get(SqlGate.sanitizeTableNameLowercase(name))

  private def splitPath(path: String): (String, String) = path.split("/") match {
    case Array(org, name)
        if org.matches("^[a-z0-9-_]+$") && name.matches("^[a-z0-9-_]+$") =>
      (org, name)
    case _ => throw new IllegalArgumentException(
      s"dataset path must be 'org/dataset' in lowercase kebab-case, got: $path")
  }
}
