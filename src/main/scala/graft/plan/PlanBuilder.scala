package graft.plan

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.schema._
import graft.transform.Transformations

/** Compiles a SemanticSchema into a lazy Spark DataFrame — the Spark-first
  * replacement for the reference's SQL-string compiler
  * (reference: pandasai/query_builders/base_query_builder.py:25-42). Where
  * the reference emits `SELECT [DISTINCT] cols FROM src [GROUP BY] [ORDER
  * BY] [LIMIT]` text for DuckDB, we build the same logical plan with the
  * DataFrame API and let Catalyst plan it (predicate pushdown, column
  * pruning, join selection are free).
  */
object DatasetPlanBuilder {

  /** `resolver` maps a dataset/table name to its DataFrame (used by
    * validate_foreign_key and by views). */
  def build(
      spark: SparkSession,
      schema: SemanticSchema,
      baseDir: String,
      resolver: String => DataFrame,
  ): DataFrame = {
    if (schema.view) return ViewPlanBuilder.build(spark, schema, resolver)
    val base = readSource(spark, schema, baseDir)
    applyQueryShape(base, schema, resolver, viewMode = false)
  }

  def readSource(spark: SparkSession, schema: SemanticSchema, baseDir: String): DataFrame = {
    val src = schema.source.getOrElse(
      throw new IllegalArgumentException(s"dataset ${schema.name} has no source"))
    src.stype match {
      case "csv" =>
        spark.read.option("header", "true").option("inferSchema", "true")
          .csv(resolvePath(src, baseDir))
      case "parquet" =>
        spark.read.parquet(resolvePath(src, baseDir))
      case t if SourceDef.remoteTypes.contains(t) =>
        val conn = src.connection
        val url = conn.getOrElse("url", jdbcUrl(t, conn))
        var reader = spark.read.format("jdbc").option("url", url)
        src.table.foreach(tbl => reader = reader.option("dbtable", tbl))
        // forward every credential/tuning key the connection declares
        // (user, password, driver, fetchsize, ...) except the ones we
        // already consumed to build the url
        (conn -- Seq("host", "port", "database", "url")).foreach {
          case (k, v) => reader = reader.option(k, v)
        }
        reader.load()
      case other =>
        throw new IllegalArgumentException(s"unsupported source type: $other")
    }
  }

  private def jdbcUrl(stype: String, conn: Map[String, String]): String = {
    val host = conn.getOrElse("host", "localhost")
    val database = conn.getOrElse("database", "")
    val port = conn.get("port").map(p => s":$p").getOrElse("")
    stype match {
      case "postgres" | "cockroachdb" =>
        s"jdbc:postgresql://$host$port/$database"
      // SQL Server's JDBC URL names the database as a property, not a
      // path segment
      case "sqlserver" =>
        s"jdbc:sqlserver://$host$port;databaseName=$database"
      case other =>
        s"jdbc:$other://$host$port/$database"
    }
  }

  private def resolvePath(src: SourceDef, baseDir: String): String = {
    val p = src.path.getOrElse(
      throw new IllegalArgumentException("local source requires a path"))
    if (p.startsWith("/")) p else s"$baseDir/$p"
  }

  /** The shared SELECT shape: projection+transform → group → distinct →
    * order → limit. `viewMode` switches column naming to the view rules
    * (`dataset.column` → `dataset_column`,
    * reference: view_query_builder.py:29-45).
    */
  private[plan] def applyQueryShape(
      base: DataFrame,
      schema: SemanticSchema,
      resolver: String => DataFrame,
      viewMode: Boolean,
  ): DataFrame = {
    val projected: DataFrame =
      if (schema.columns.isEmpty) base
      else {
        // fold the frame through per-column transformation chains (some
        // chains re-plan the frame: normalize/standardize/foreign-key)
        val (framed, outCols) =
          schema.columns.foldLeft((base, Vector.empty[Column])) {
            case ((df, acc), c) =>
              val raw = c.expression.map(expr).getOrElse(colRef(c.name, viewMode))
              val (df2, e) = Transformations.applyColumn(
                df, c.name, raw, schema.transformations, resolver)
              val outName = outputName(c, schema)
              (df2, acc :+ e.as(outName))
          }
        if (schema.groupBy.nonEmpty) {
          val keyNames = schema.groupBy.map(k => normalizeKey(k, viewMode).toLowerCase)
          def matchesKey(c: ColumnDef): Boolean =
            keyNames.contains(outputName(c, schema).toLowerCase) ||
              keyNames.contains(c.name.toLowerCase)
          val (keys, aggs) = schema.columns.zip(outCols).partition {
            case (c, _) => matchesKey(c)
          }
          // SQL allows grouping by a column that isn't selected — keys
          // with no declared column group on the raw expression (and are
          // dropped by the final projection), instead of being silently
          // ignored (which would degrade to ONE global row)
          val extraKeys = keyNames.filterNot(k =>
            schema.columns.exists(c => matchesKey(c) &&
              (outputName(c, schema).toLowerCase == k || c.name.toLowerCase == k)))
            .map(expr(_))
          require(aggs.nonEmpty, s"group_by on ${schema.name} needs at least one aggregated column")
          val grouped = framed
            .groupBy(keys.map(_._2) ++ extraKeys: _*)
            .agg(aggs.head._2, aggs.tail.map(_._2): _*)
          // restore declared column order
          grouped.select(schema.columns.map(c => col(outputName(c, schema))): _*)
        } else framed.select(outCols: _*)
      }

    val distincted =
      if (Transformations.hasRemoveDuplicates(schema.transformations))
        projected.distinct()
      else projected

    val ordered =
      if (schema.orderBy.nonEmpty)
        distincted.orderBy(schema.orderBy.map(parseOrder): _*)
      else distincted

    schema.limit.fold(ordered)(ordered.limit)
  }

  private def colRef(name: String, viewMode: Boolean): Column = col(name)

  private def normalizeKey(k: String, viewMode: Boolean): String =
    if (viewMode) k.replace(".", "_") else k

  /** Output naming: explicit alias > rename transformation > (view:
    * `ds.col`→`ds_col`) > declared name. */
  def outputName(c: ColumnDef, schema: SemanticSchema): String =
    c.alias
      .orElse(Transformations.renameTarget(c.name, schema.transformations))
      .getOrElse(if (schema.view) c.name.replace(".", "_") else c.name)

  /** Parse an `order_by` entry like `"revenue DESC"` into a sort Column. */
  def parseOrder(s: String): Column = {
    val t = s.trim
    val m = "(?i)^(.*?)\\s+(asc|desc)$".r
    t match {
      case m(e, dir) =>
        if (dir.equalsIgnoreCase("desc")) expr(e).desc else expr(e).asc
      case _ => expr(t).asc
    }
  }
}

/** View composition: joins of dependency plans by declared relations
  * (reference: pandasai/query_builders/view_query_builder.py:100-148,
  * dependency resolution pandasai/data_loader/view_loader.py:43-71).
  * Each side of the join is the dependency's own compiled plan; Catalyst
  * sees the whole tree and can pick broadcast joins for small sides.
  */
object ViewPlanBuilder {

  def build(
      spark: SparkSession,
      schema: SemanticSchema,
      resolver: String => DataFrame,
  ): DataFrame = {
    require(schema.view, s"${schema.name} is not a view")
    val datasets: Seq[String] = {
      val fromCols = schema.columns.map(_.name.split("\\.")(0))
      val fromRels = schema.relations.flatMap(r =>
        Seq(r.from.split("\\.")(0), r.to.split("\\.")(0)))
      (fromRels ++ fromCols).distinct
    }
    val first = schema.relations.headOption
      .map(_.from.split("\\.")(0))
      .getOrElse(schema.columns.head.name.split("\\.")(0))

    val depFrames = datasets.map(d => d -> resolver(d)).toMap
    def dsOf(ref: String): String = ref.split("\\.")(0)

    // Join relations in dependency order: each step pulls in ONE not-yet-
    // joined dataset with ALL relations connecting it to the joined set
    // AND-ed into that join (view_query_builder.py:120-138 groups by
    // target only, which breaks when a dataset appears solely on the
    // `from` side — e.g. two facts sharing a dimension). Relations whose
    // datasets are both already joined become filters.
    var joined = depFrames(first).alias(first)
    val joinedSet = scala.collection.mutable.Set(first)
    var pending = schema.relations.toList
    while (pending.nonEmpty) {
      val touching = pending.filter(r =>
        joinedSet(dsOf(r.from)) || joinedSet(dsOf(r.to)))
      if (touching.isEmpty)
        throw new IllegalArgumentException(
          s"view ${schema.name}: relations ${pending.map(r => s"${r.from}->${r.to}")} are disconnected from the join tree")
      val (bothJoined, bridging) = touching.partition(r =>
        joinedSet(dsOf(r.from)) && joinedSet(dsOf(r.to)))
      if (bridging.nonEmpty) {
        val next = bridging.head
        val newDs = if (joinedSet(dsOf(next.from))) dsOf(next.to) else dsOf(next.from)
        val connecting = bridging.filter(r =>
          dsOf(r.from) == newDs || dsOf(r.to) == newDs)
        val cond = connecting.map(r => col(r.from) === col(r.to)).reduce(_ && _)
        joined = joined.join(depFrames(newDs).alias(newDs), cond, "inner")
        joinedSet += newDs
        pending = pending.filterNot(connecting.contains)
      } else {
        bothJoined.foreach(r => joined = joined.where(col(r.from) === col(r.to)))
        pending = pending.filterNot(bothJoined.contains)
      }
    }
    // datasets with no relations at all (single-dataset views) are already
    // covered by `first`; any other unjoined dataset is an error caught by
    // column resolution

    // flatten every dependency column `ds.col` → `ds_col`
    // (view_query_builder.py:29-45); declared columns and rewritten
    // expressions then resolve against the flat names, and Catalyst prunes
    // whatever the projection doesn't use.
    val flattened = joined.select(datasets.flatMap { ds =>
      depFrames(ds).columns.map(c => col(s"$ds.$c").as(s"${ds}_$c"))
    }: _*)

    val innerSchema = schema.copy(
      view = false,
      source = None,
      columns = schema.columns.map { c =>
        val flat = c.name.replace(".", "_")
        c.copy(name = flat,
          expression = c.expression.map(rewriteViewExpr))
      },
      relations = Seq.empty,
      groupBy = schema.groupBy.map(_.replace(".", "_")),
      orderBy = schema.orderBy.map(_.replace(".", "_")),
      transformations = schema.transformations.map { t =>
        t.column match {
          case Some(cn) => t.copy(params = t.params.updated("column", cn.replace(".", "_")))
          case None     => t
        }
      },
    )
    DatasetPlanBuilder.applyQueryShape(flattened, innerSchema, resolver, viewMode = true)
  }

  /** The reference rewrites `a.b`/`a-b` inside view expressions to `a_b`
    * (view_query_builder.py:52-57). Divergence on purpose: both sides
    * must START with a letter/underscore — the reference's
    * `[a-zA-Z0-9_]+` also matches decimal literals, corrupting
    * `x * 0.5` into `x * 0_5` (SURVEY.md §7.4 class of quirk).
    */
  def rewriteViewExpr(e: String): String =
    e.replaceAll("([a-zA-Z_][a-zA-Z0-9_]*)-([a-zA-Z_][a-zA-Z0-9_]*)", "$1_$2")
      .replaceAll("([a-zA-Z_][a-zA-Z0-9_]*)\\.([a-zA-Z_][a-zA-Z0-9_]*)", "$1_$2")
}
