package graft.response

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class ChartsSpec extends SparkSpec {

  private lazy val agg = Tables.load(spark, sf, "customer")
    .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))

  test("toChart infers encoding types and embeds a vega-lite spec") {
    val c = Charts.toChart(agg, "bar", "c_mktsegment", "n", Some("by segment"))
    assert(c.kind == "plot")
    assert(c.spec.contains("\"mark\": \"bar\""))
    assert(c.spec.contains("\"field\": \"c_mktsegment\", \"type\": \"nominal\""))
    assert(c.spec.contains("\"field\": \"n\", \"type\": \"quantitative\""))
    assert(c.spec.contains("vega-lite/v5"))
    assert(c.data.count() == 5)
  }

  test("unknown field and oversized data are rejected") {
    intercept[Charts.ChartSpecError] {
      Charts.toChart(agg, "bar", "nope", "n")
    }
    intercept[Charts.ChartSpecError] {
      Charts.toChart(Tables.load(spark, sf, "lineitem"), "point",
        "l_orderkey", "l_quantity", maxRows = 100)
    }
    intercept[IllegalArgumentException] {
      Charts.spec("pie3d", "a", "b")
    }
  }
}
