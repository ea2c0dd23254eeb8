package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{Command, LogicalPlan}

/** SELECT-only gate + relation whitelist for LLM-authored SQL.
  *
  * The reference sanitizes SQL strings with a sqlglot parse + a keyword
  * regex screen (reference: pandasai/helpers/sql_sanitizer.py:40-112) and
  * whitelists table names via an AST walk (reference:
  * pandasai/core/code_generation/code_cleaning.py:42-110). Spark-first
  * version: parse with Spark's own parser, reject any plan that is a
  * Command (DDL/DML), then walk the analyzed tree's UnresolvedRelations
  * against the set of registered dataset views. No string rewriting — the
  * datasets are registered as temp views so the LLM's table refs resolve
  * directly (SURVEY.md §2.3 Q3).
  */
object SqlGate {

  final class MaliciousQueryError(msg: String) extends RuntimeException(msg)

  /** The reference's blocked-keyword screen (sql_sanitizer.py:42-79),
    * kept as defense-in-depth on top of the plan-type check. `EXPLAIN`,
    * comments, and session/user probes are rejected outright.
    */
  private val blockedKeywords: Seq[String] = Seq(
    "INSERT", "UPDATE", "DELETE", "DROP", "EXEC", "ALTER", "CREATE",
    "MERGE", "TRUNCATE", "LOAD", "GRANT", "REVOKE", "CALL", "EXECUTE",
    "SHOW", "DESCRIBE", "EXPLAIN", "DECLARE", "SLEEP", "BENCHMARK",
    "CURRENT_USER", "SESSION_USER", "SYSTEM_USER")

  private val blockedPatterns: Seq[scala.util.matching.Regex] =
    blockedKeywords.map(k => s"(?i)\\b$k\\b".r) ++
      Seq("--".r, "(?s)/\\*.*\\*/".r)

  def isSqlQuerySafe(spark: SparkSession, sql: String): Boolean =
    try { validate(spark, sql); true }
    catch { case _: Throwable => false }

  /** Throws MaliciousQueryError unless `sql` is a pure query. */
  def validate(spark: SparkSession, sql: String): LogicalPlan = {
    blockedPatterns.find(_.findFirstIn(sql).isDefined).foreach { p =>
      throw new MaliciousQueryError(
        s"query blocked: contains forbidden token ${p.regex}")
    }
    val plan =
      try spark.sessionState.sqlParser.parsePlan(sql)
      catch {
        case e: Exception =>
          throw new MaliciousQueryError(s"query failed to parse: ${e.getMessage}")
      }
    if (plan.isInstanceOf[Command] || plan.find(_.isInstanceOf[Command]).isDefined)
      throw new MaliciousQueryError("only SELECT queries are allowed")
    plan
  }

  /** All table names referenced by the (unanalyzed) plan that must be
    * whitelisted. Scope-aware recursive walk:
    *  - descends into expression subqueries (EXISTS / IN / scalar) — a
    *    plain plan.collect misses them and would let
    *    `WHERE EXISTS (SELECT 1 FROM secret)` through;
    *  - CTE names are visible only within their defining WITH's scope,
    *    so an inner CTE cannot shadow-exempt an outer real table;
    *  - qualified references (`db.table`) are reported verbatim — they
    *    resolve to catalog tables, never to registered temp views, so
    *    they can never match a whitelist of bare view names.
    */
  def referencedTables(plan: LogicalPlan): Set[String] = {
    import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
    import org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith

    def walk(p: LogicalPlan, visible: Set[String]): Set[String] = p match {
      case w: UnresolvedWith =>
        // CTE scope follows declaration order: each body sees only the
        // names declared BEFORE it — never its own name, never a forward
        // reference. Spark resolves CTEs the same way, so exempting a
        // body's own name would let `WITH t AS (SELECT * FROM t) …`
        // resolve the inner `t` to a real catalog table/temp view that
        // was never whitelisted. Only the WITH child sees the full set.
        val (bodyRefs, declared) =
          w.cteRelations.foldLeft((Set.empty[String], Set.empty[String])) {
            case ((refs, seen), (name, body, _)) =>
              (refs ++ walk(body, visible ++ seen), seen + name.toLowerCase)
          }
        bodyRefs ++ walk(w.child, visible ++ declared)
      case r: UnresolvedRelation =>
        val parts = r.multipartIdentifier.map(_.toLowerCase)
        if (parts.length > 1) Set(parts.mkString("."))
        else if (visible.contains(parts.head)) Set.empty
        else Set(parts.head)
      case other =>
        val fromChildren = other.children.flatMap(walk(_, visible)).toSet
        val fromSubqueries = other.expressions.flatMap(_.collect {
          case sq: SubqueryExpression => walk(sq.plan, visible)
        }).flatten.toSet
        fromChildren ++ fromSubqueries
    }
    walk(plan, Set.empty)
  }

  /** Whitelist check (code_cleaning.py:42-110): every referenced relation
    * must be a registered dataset/view. */
  def checkTables(spark: SparkSession, sql: String, known: Set[String]): LogicalPlan = {
    val plan = validate(spark, sql)
    val refs = referencedTables(plan)
    val knownLower = known.map(_.toLowerCase)
    val unknown = refs -- knownLower
    if (unknown.nonEmpty)
      throw new MaliciousQueryError(
        s"query references unknown tables: ${unknown.mkString(", ")}")
    plan
  }

  /** Table/file name sanitizer (sql_sanitizer.py:9-37): non-alphanumeric →
    * `_`, 64-char cap; lowercase variant for file-derived table names. */
  def sanitizeTableName(name: String): String =
    name.replaceAll("[^a-zA-Z0-9_]", "_").take(64)

  def sanitizeTableNameLowercase(name: String): String =
    sanitizeTableName(name).toLowerCase

  /** Identifier normalize+quote for SQL-string contexts (reference
    * normalizes to lowercase and double-quotes every identifier so
    * injection is inert, base_query_builder.py:30,42). Plan-building via
    * the Column API doesn't need this; it exists for the few places that
    * splice an identifier into `spark.sql` text — Spark quotes with
    * backticks.
    */
  def quoteIdentifier(name: String): String =
    "`" + name.toLowerCase.replace("`", "``") + "`"

  def sanitizeFileName(path: String): String = {
    val base = new java.io.File(path).getName
    val noExt = base.lastIndexOf('.') match {
      case -1 => base
      case i  => base.substring(0, i)
    }
    sanitizeTableNameLowercase(noExt)
  }
}
