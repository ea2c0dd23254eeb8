package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries._

/** Consistency of the driver contract surfaces — failures here are the
  * silent-drop kind: a duplicate query name collapses in `toMap` (last
  * def wins, the first silently stops being checked), and Bench's
  * `.filter(qs.contains)` would skip a mistyped headline name without
  * any error in the official record.
  */
class ContractSpec extends AnyFunSuite {

  private val allDefs: Seq[QueryDef] =
    SourceQueries.defs ++ RelationalQueries.defs ++
      TransformQueries.defs ++ PipelineQueries.defs ++ OperatorQueries.defs

  test("query names are unique across all def catalogs") {
    val dups = allDefs.groupBy(_.name).filter(_._2.size > 1).keys.toSeq.sorted
    assert(dups.isEmpty, s"duplicate query names (toMap silently drops): $dups")
  }

  test("every Bench headline name resolves to a query") {
    val qs = SparkEntry.queries.keySet
    val missing = Bench.headline.filterNot(qs.contains)
    assert(missing.isEmpty, s"headline names not in SparkEntry.queries: $missing")
  }

  test("every oracle belongs to a query and names no missing tables") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
    // oracles reference driver-registered views or {SFDIR} paths only;
    // catch references to tables the harness never registers
    val known = Tables.names.toSet
    val tableRef = "(?i)\\bFROM\\s+([a-z_][a-z0-9_]*)\\b".r
    SparkEntry.oracleSql.foreach { case (name, rawSql) =>
      // table names inside string LITERALS are data, not references
      // (q5's whitelist probe embeds a rejected table name in a string)
      val sql = rawSql.replaceAll("'[^']*'", "''")
      tableRef.findAllMatchIn(sql).map(_.group(1).toLowerCase).foreach { t =>
        val cteNames = "(?i)\\b([a-z_][a-z0-9_]*)\\s+AS(?:\\s+MATERIALIZED)?\\s*\\(".r
          .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
        assert(known.contains(t) || cteNames.contains(t) ||
          t == "read_parquet" || t == "read_csv" || t == "unnest",
          s"$name: oracle references unknown table '$t'")
      }
    }
  }
}
