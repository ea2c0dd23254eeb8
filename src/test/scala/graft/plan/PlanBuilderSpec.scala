package graft.plan

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.Tables
import graft.schema._

class PlanBuilderSpec extends SparkSpec {

  private def resolver(n: String) = Tables.load(spark, sf, n)

  test("L1 shape: projection + expression + group_by + order_by + limit") {
    val schema = SemanticSchema(
      name = "order_stats",
      source = Some(SourceDef("parquet", path = Some(s"$sf/orders.parquet"))),
      columns = Seq(
        ColumnDef("o_orderstatus"),
        ColumnDef("n", expression = Some("count(*)")),
      ),
      groupBy = Seq("o_orderstatus"),
      orderBy = Seq("n DESC", "o_orderstatus ASC"),
      limit = Some(2),
    ).validate()
    val df = DatasetPlanBuilder.build(spark, schema, sf, resolver)
    val rows = df.collect()
    assert(rows.length == 2)
    assert(df.columns.toSeq == Seq("o_orderstatus", "n"))
    // descending by count
    assert(rows(0).getLong(1) >= rows(1).getLong(1))
  }

  test("remove_duplicates triggers whole-plan DISTINCT (base_query_builder.py:93-103)") {
    val schema = SemanticSchema(
      name = "segs",
      source = Some(SourceDef("parquet", path = Some(s"$sf/customer.parquet"))),
      columns = Seq(ColumnDef("c_mktsegment")),
      transformations = Seq(
        TransformDef("remove_duplicates", Map("column" -> "c_mktsegment"))),
      orderBy = Seq("c_mktsegment ASC"),
    ).validate()
    val out = DatasetPlanBuilder.build(spark, schema, sf, resolver).collect()
    assert(out.length == 5) // 5 market segments, deduped
  }

  test("alias and rename-transformation naming") {
    val schema = SemanticSchema(
      name = "c",
      source = Some(SourceDef("parquet", path = Some(s"$sf/customer.parquet"))),
      columns = Seq(
        ColumnDef("c_custkey", alias = Some("id")),
        ColumnDef("c_acctbal"),
      ),
      transformations = Seq(TransformDef("rename",
        Map("column" -> "c_acctbal", "new_name" -> "balance"))),
      limit = Some(1),
    ).validate()
    val df = DatasetPlanBuilder.build(spark, schema, sf, resolver)
    assert(df.columns.toSeq == Seq("id", "balance"))
  }

  test("csv source reads with header+inferSchema") {
    val tmp = "/root/repo/target/graft-tmp/test_csv"
    Tables.load(spark, sf, "region").coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(tmp)
    val schema = SemanticSchema(
      name = "regions",
      source = Some(SourceDef("csv", path = Some(tmp))),
      orderBy = Seq("r_regionkey ASC"),
    ).validate()
    val df = DatasetPlanBuilder.build(spark, schema, sf, resolver)
    assert(df.count() == 5)
    assert(df.schema("r_regionkey").dataType.typeName == "integer")
  }

  test("view: relation join + dataset_column aliasing + group_by (view_query_builder.py)") {
    val view = SemanticSchema(
      name = "cust_nation",
      view = true,
      columns = Seq(
        ColumnDef("customers.c_custkey"),
        ColumnDef("nations.n_name"),
      ),
      relations = Seq(RelationDef(None, None,
        "customers.c_nationkey", "nations.n_nationkey")),
      orderBy = Seq("customers.c_custkey ASC"),
      limit = Some(3),
    ).validate()
    val deps = Map(
      "customers" -> Tables.load(spark, sf, "customer"),
      "nations" -> Tables.load(spark, sf, "nation"))
    val df = ViewPlanBuilder.build(spark, view, deps(_))
    assert(df.columns.toSeq == Seq("customers_c_custkey", "nations_n_name"))
    assert(df.count() == 3)
  }

  test("golden parents/children view fixture (test_view_query_builder.py:49-79)") {
    import spark.implicits._
    // parents(id, name), children(id FK, name), relation parents.id →
    // children.id, view columns (parents_id, parents_name, children_name)
    val parents = Seq((1, "alice"), (2, "bob"), (3, "carol")).toDF("id", "name")
    val children = Seq((1, "kid_a"), (1, "kid_b"), (2, "kid_c")).toDF("id", "name")
    val view = SemanticSchema(
      name = "parent_children",
      view = true,
      columns = Seq(
        ColumnDef("parents.id"),
        ColumnDef("parents.name"),
        ColumnDef("children.name"),
      ),
      relations = Seq(RelationDef(None, None, "parents.id", "children.id")),
      orderBy = Seq("parents.id ASC", "children.name ASC"),
    ).validate()
    val df = ViewPlanBuilder.build(spark, view,
      Map("parents" -> parents, "children" -> children)(_))
    assert(df.columns.toSeq == Seq("parents_id", "parents_name", "children_name"))
    assert(df.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq ==
      Seq((1, "alice", "kid_a"), (1, "alice", "kid_b"), (2, "bob", "kid_c")))
  }

  test("view expression rewriting: a.b → a_b (view_query_builder.py:52-57)") {
    assert(ViewPlanBuilder.rewriteViewExpr("sum(orders.total) - fees.flat-rate")
      == "sum(orders_total) - fees_flat_rate")
    // decimal literals survive (the reference's regex corrupts 0.5 → 0_5)
    assert(ViewPlanBuilder.rewriteViewExpr("customers.c_acctbal * 0.5")
      == "customers_c_acctbal * 0.5")
  }

  test("group_by key outside the declared columns still groups per key") {
    val schema = SemanticSchema(
      name = "spend",
      source = Some(SourceDef("parquet", path = Some(s"$sf/orders.parquet"))),
      columns = Seq(ColumnDef("total",
        expression = Some("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)"))),
      groupBy = Seq("o_orderstatus"),
    ).validate()
    val out = DatasetPlanBuilder.build(spark, schema, sf, resolver)
    assert(out.columns.toSeq == Seq("total"))
    // one row PER status, not one global row
    assert(out.count() == 3)
  }

  test("view joins a dataset that appears only on the relation's from side") {
    // two facts sharing one dimension: customers.nk→nations.nk AND
    // suppliers.nk→nations.nk (suppliers is never a relation target)
    val view = SemanticSchema(
      name = "nation_actors",
      view = true,
      columns = Seq(
        ColumnDef("nations.n_name"),
        ColumnDef("customers.c_custkey"),
        ColumnDef("suppliers.s_suppkey"),
      ),
      relations = Seq(
        RelationDef(None, None, "customers.c_nationkey", "nations.n_nationkey"),
        RelationDef(None, None, "suppliers.s_nationkey", "nations.n_nationkey")),
      orderBy = Seq("customers.c_custkey ASC", "suppliers.s_suppkey ASC"),
    ).validate()
    val deps = Map(
      "customers" -> Tables.load(spark, sf, "customer"),
      "nations" -> Tables.load(spark, sf, "nation"),
      "suppliers" -> Tables.load(spark, sf, "supplier"))
    val df = ViewPlanBuilder.build(spark, view, deps(_))
    assert(df.columns.length == 3)
    assert(df.count() > 0)
  }

  test("order_by parser handles direction suffixes") {
    assert(DatasetPlanBuilder.parseOrder("x DESC").toString.contains("DESC"))
    assert(DatasetPlanBuilder.parseOrder("x").toString.contains("ASC"))
    assert(DatasetPlanBuilder.parseOrder("a + b desc").toString.contains("DESC"))
  }
}
