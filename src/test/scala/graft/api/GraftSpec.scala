package graft.api

import graft.{SparkSpec, Tables}
import graft.agent.FakeLlm
import graft.response._
import graft.schema.SourceDef

class GraftSpec extends SparkSpec {

  test("configure → readCsv → df.chat round-trip with the FakeLLM") {
    val csvDir = "/root/repo/target/graft-tmp/api_csv"
    Tables.load(spark, sf, "region").coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(csvDir)
    Graft.configure(spark,
      new FakeLlm(Seq("SELECT count(*) AS n FROM regions")),
      datasetsRoot = "/root/repo/target/graft-tmp/api_ds")
    val df = Graft.readCsv(s"$csvDir")
    import Graft.ChatOps
    df.chat("how many regions?", name = "regions") match {
      case NumberR(v) => assert(v == 5.0)
      case other      => fail(s"expected NumberR, got $other")
    }
  }

  test("readExcel loads a sheet through the facade") {
    Graft.configure(spark, new FakeLlm(Seq("SELECT 1 AS x")),
      datasetsRoot = "/root/repo/target/graft-tmp/api_ds")
    val path = "/root/repo/target/graft-tmp/api_excel.xlsx"
    graft.sources.Excel.write(Tables.load(spark, sf, "region"), path)
    val back = Graft.readExcel(path)
    assert(back.count() == 5)
    assert(back.columns.contains("r_name"))
  }

  test("multi-frame chat registers every frame for the SQL surface") {
    Graft.configure(spark, new FakeLlm(Seq(
      "SELECT count(*) AS n FROM custs JOIN nats ON c_nationkey = n_nationkey")),
      datasetsRoot = "/root/repo/target/graft-tmp/api_ds2")
    val out = Graft.chat("customers with nations?",
      "custs" -> Tables.load(spark, sf, "customer"),
      "nats" -> Tables.load(spark, sf, "nation"))
    assert(out.asInstanceOf[NumberR].value == 150.0)
  }

  test("create/load through the facade") {
    Graft.configure(spark, new FakeLlm(Seq("SELECT 1 AS x")),
      datasetsRoot = "/root/repo/target/graft-tmp/api_ds3")
    Graft.create("org/suppliers", Tables.load(spark, sf, "supplier"))
    assert(Graft.load("org/suppliers").count() == 10)
  }

  test("chat starts a fresh conversation; followUp continues or errors") {
    val llm = new FakeLlm(Seq(
      "SELECT count(*) AS n FROM regs",
      "SELECT count(*) AS n2 FROM regs",
      "SELECT count(*) AS n3 FROM regs"))
    Graft.configure(spark, llm,
      datasetsRoot = "/root/repo/target/graft-tmp/api_ds4")
    // follow-up before any chat → reference raises (pandasai/__init__.py:251-255)
    val e = intercept[IllegalStateException](Graft.followUp("and then?"))
    assert(e.getMessage.contains("No existing conversation"))

    Graft.chat("how many?", "regs" -> Tables.load(spark, sf, "region"))
    Graft.followUp("again?") // continues: prior turn visible in the prompt
    assert(llm.prompts(1).contains("### PREVIOUS CONVERSATION"))
    assert(llm.prompts(1).contains("how many?"))
    // a NEW chat clears memory — its prompt carries no previous turns
    Graft.chat("fresh start", "regs" -> Tables.load(spark, sf, "region"))
    assert(!llm.prompts.last.contains("### PREVIOUS CONVERSATION"))
  }

  test("source compatibility families (agent/base.py:74-79)") {
    val csv = SourceDef("csv", path = Some("a.csv"))
    val parquet = SourceDef("parquet", path = Some("b.parquet"))
    val pg1 = SourceDef("postgres", table = Some("t"),
      connection = Map("host" -> "h1", "database" -> "d"))
    val pg2 = SourceDef("postgres", table = Some("u"),
      connection = Map("host" -> "h2", "database" -> "d"))
    assert(Graft.checkCompatibleSources(Seq(csv, parquet)))
    assert(Graft.checkCompatibleSources(Seq(pg1, pg1)))
    assert(!Graft.checkCompatibleSources(Seq(csv, pg1)))
    assert(!Graft.checkCompatibleSources(Seq(pg1, pg2)))
  }
}
