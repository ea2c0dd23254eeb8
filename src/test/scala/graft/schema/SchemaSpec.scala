package graft.schema

import org.scalatest.funsuite.AnyFunSuite

class SchemaSpec extends AnyFunSuite {

  private val yaml =
    """name: sales-data
      |description: sales dataset
      |source:
      |  type: parquet
      |  path: data.parquet
      |columns:
      |- name: region
      |  type: string
      |- name: revenue
      |  type: float
      |  expression: sum(amount)
      |  alias: total_revenue
      |transformations:
      |- type: to_uppercase
      |  params:
      |    column: region
      |group_by:
      |- region
      |order_by:
      |- region ASC
      |limit: 100
      |""".stripMargin

  test("YAML parse carries every declared field") {
    val s = SemanticSchema.fromYaml(yaml)
    assert(s.name == "sales-data")
    assert(s.source.exists(_.stype == "parquet"))
    assert(s.columns.map(_.name) == Seq("region", "revenue"))
    assert(s.columns(1).expression.contains("sum(amount)"))
    assert(s.columns(1).alias.contains("total_revenue"))
    assert(s.transformations.head.ttype == "to_uppercase")
    assert(s.transformations.head.column.contains("region"))
    assert(s.groupBy == Seq("region"))
    assert(s.orderBy == Seq("region ASC"))
    assert(s.limit.contains(100))
  }

  test("YAML round-trip: emit → parse → same schema") {
    val s = SemanticSchema.fromYaml(yaml)
    val s2 = SemanticSchema.fromYaml(SemanticSchema.toYaml(s))
    assert(s2 == s)
  }

  test("YAML round-trip quotes reserved scalars — 'no', 'true', '123' stay strings") {
    val s = SemanticSchema.fromYaml(yaml).copy(description = Some("no"))
    val s2 = SemanticSchema.fromYaml(SemanticSchema.toYaml(s))
    assert(s2.description.contains("no"), "description 'no' must not become boolean false")
    for (v <- Seq("true", "False", "null", "~", "123", "1.5", ".5", "1e3", "on")) {
      val sv = SemanticSchema.fromYaml(yaml).copy(description = Some(v))
      val rt = SemanticSchema.fromYaml(SemanticSchema.toYaml(sv))
      assert(rt.description.contains(v), s"description '$v' must round-trip as a string")
    }
  }

  test("YAML round-trip preserves list/map transformation params (java collections)") {
    val withBin =
      """name: binned
        |source:
        |  type: parquet
        |  path: d.parquet
        |transformations:
        |- type: bin
        |  params:
        |    column: v
        |    bins:
        |    - 0
        |    - 10
        |    labels:
        |    - low
        |- type: map_values
        |  params:
        |    column: s
        |    mapping:
        |      a: A
        |""".stripMargin
    val s = SemanticSchema.fromYaml(withBin)
    val s2 = SemanticSchema.fromYaml(SemanticSchema.toYaml(s))
    assert(s2.transformations.head.list("bins").map(_.toString.toDouble) == Seq(0.0, 10.0))
    assert(s2.transformations.head.list("labels").map(_.toString) == Seq("low"))
    assert(s2.transformations(1).mapping == Map("a" -> "A"))
  }

  test("group_by × expression exclusivity (semantic_layer_schema.py:316-331)") {
    // a column that is neither grouped nor aggregated must be rejected
    intercept[IllegalArgumentException] {
      SemanticSchema(
        name = "bad",
        source = Some(SourceDef("parquet", path = Some("x.parquet"))),
        columns = Seq(ColumnDef("a"), ColumnDef("b")),
        groupBy = Seq("a"),
      ).validate()
    }
  }

  test("source xor view (semantic_layer_schema.py:348-351)") {
    intercept[IllegalArgumentException] {
      SemanticSchema(name = "nosource").validate()
    }
    intercept[IllegalArgumentException] {
      SemanticSchema(name = "both", view = true,
        source = Some(SourceDef("parquet", path = Some("x.parquet"))),
        columns = Seq(ColumnDef("a.b"))).validate()
    }
  }

  test("view columns must be dataset.column") {
    intercept[IllegalArgumentException] {
      SemanticSchema(name = "v", view = true,
        columns = Seq(ColumnDef("noprefix"))).validate()
    }
  }

  test("invalid column type and transformation type are rejected") {
    intercept[IllegalArgumentException] {
      SemanticSchema(name = "t",
        source = Some(SourceDef("parquet", path = Some("x.parquet"))),
        columns = Seq(ColumnDef("a", ctype = Some("decimal")))).validate()
    }
    intercept[IllegalArgumentException] {
      SemanticSchema(name = "t",
        source = Some(SourceDef("parquet", path = Some("x.parquet"))),
        transformations = Seq(TransformDef("not_a_transform", Map.empty))).validate()
    }
  }
}
