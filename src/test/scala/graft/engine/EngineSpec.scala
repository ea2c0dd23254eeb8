package graft.engine

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class EngineSpec extends SparkSpec {

  private def freshEngine(tag: String): Engine = {
    val root = s"/root/repo/target/graft-tmp/engine-$tag"
    new Engine(spark, root)
  }

  test("create → schema.yaml + data.parquet on disk → load round-trip") {
    val e = freshEngine("roundtrip")
    val df = Tables.load(spark, sf, "region")
    e.create("org/regions", df)
    assert(Files.exists(Paths.get(e.datasetsRoot, "org", "regions", "schema.yaml")))
    assert(Files.exists(Paths.get(e.datasetsRoot, "org", "regions", "data.parquet")))
    val loaded = e.load("org/regions")
    assert(loaded.count() == 5)
    assert(e.knownTables.contains("regions"))
    // lazy head/count surface (virtual_dataframe.py:15-51)
    assert(e.head("regions", 2).count() == 2)
    assert(e.rowCount("regions") == 5)
  }

  test("dataset path validation (org/dataset kebab-case)") {
    val e = freshEngine("paths")
    val df = Tables.load(spark, sf, "region")
    intercept[IllegalArgumentException](e.create("NoSlash", df))
    intercept[IllegalArgumentException](e.create("Bad Case/x", df))
  }

  test("executeSqlQuery: known tables pass, unknown or non-SELECT rejected") {
    val e = freshEngine("sql")
    e.register("region", Tables.load(spark, sf, "region"))
    assert(e.executeSqlQuery("SELECT count(*) AS n FROM region").head().getLong(0) == 5)
    intercept[SqlGate.MaliciousQueryError] {
      e.executeSqlQuery("SELECT * FROM other_table")
    }
    intercept[SqlGate.MaliciousQueryError] {
      e.executeSqlQuery("DROP TABLE region")
    }
  }

  test("view dataset loads dependencies from the same org (view_loader.py:43-71)") {
    val e = freshEngine("views")
    e.create("org/custs", Tables.load(spark, sf, "customer"))
    e.create("org/nats", Tables.load(spark, sf, "nation"))
    val viewYaml =
      """name: cust-nation
        |view: true
        |columns:
        |- name: custs.c_custkey
        |- name: nats.n_name
        |relations:
        |- from: custs.c_nationkey
        |  to: nats.n_nationkey
        |""".stripMargin
    val dir = Paths.get(e.datasetsRoot, "org", "cust-nation")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("schema.yaml"), viewYaml)
    val v = e.load("org/cust-nation")
    assert(v.columns.toSeq == Seq("custs_c_custkey", "nats_n_name"))
    assert(v.count() == Tables.load(spark, sf, "customer").count())
  }

  test("missing dataset and circular view dependencies fail with clear errors") {
    val e = freshEngine("cycles")
    val missing = intercept[IllegalArgumentException](e.load("org/does-not-exist"))
    assert(missing.getMessage.contains("dataset not found"))

    // two views that reference each other: a → b → a must be reported as
    // a cycle, not overflow the stack
    def viewYaml(name: String, dep: String) =
      s"""name: $name
         |view: true
         |columns:
         |- name: $dep.x
         |""".stripMargin
    for ((n, d) <- Seq(("view_a", "view_b"), ("view_b", "view_a"))) {
      val dir = Paths.get(e.datasetsRoot, "org", n)
      Files.createDirectories(dir)
      Files.writeString(dir.resolve("schema.yaml"), viewYaml(n, d))
    }
    val cyc = intercept[IllegalArgumentException](e.load("org/view_a"))
    assert(cyc.getMessage.contains("circular view dependency"), cyc.getMessage)
  }

  test("paginator: search + sort + offset/limit") {
    val df = Tables.load(spark, sf, "customer")
    val page = Paginator.paginate(df, Paginator.Params(
      page = 1, pageSize = 10, search = Some("BUILDING"),
      sortBy = Some("c_custkey")))
    val rows = page.collect()
    assert(rows.length <= 10)
    // numeric search term matches numeric columns by equality
    val byKey = Paginator.paginate(df, Paginator.Params(
      page = 1, pageSize = 5, search = Some("7")))
    assert(byKey.count() >= 1)
  }

  test("destination sink writes csv and parquet") {
    val e = freshEngine("sink")
    val df = Tables.load(spark, sf, "region")
    val out = s"/root/repo/target/graft-tmp/sink-test"
    e.writeDestination(df, graft.schema.DestinationDef("local", "csv", s"$out/csv"))
    e.writeDestination(df, graft.schema.DestinationDef("local", "parquet", s"$out/parquet"))
    assert(spark.read.option("header", "true").csv(s"$out/csv").count() == 5)
    assert(spark.read.parquet(s"$out/parquet").count() == 5)
  }
}
