package graft.response

import org.apache.spark.sql.DataFrame

/** Chart responses: the reference renders matplotlib PNGs inside generated
  * Python (reference: pandasai/core/response/chart.py and
  * core/code_execution/environment.py:22-35); a JVM engine instead
  * returns the aggregated data plus a declarative vega-lite spec — the
  * consumer renders. The data frame is expected to be the small
  * aggregated result (chart-sized), not raw rows; `toChart` guards with
  * a row cap so nobody ships a million-point scatter to a browser.
  */
object Charts {

  final case class ChartSpecError(msg: String) extends RuntimeException(msg)

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  /** Minimal vega-lite v5 spec. `mark` ∈ bar | line | point | area. */
  def spec(mark: String, xField: String, yField: String,
      xType: String = "nominal", yType: String = "quantitative",
      title: Option[String] = None): String = {
    require(Set("bar", "line", "point", "area").contains(mark),
      s"unsupported mark: $mark")
    val t = title.map(s => s""""title": "${esc(s)}",""").getOrElse("")
    s"""{
       |  "$$schema": "https://vega.github.io/schema/vega-lite/v5.json",
       |  $t
       |  "mark": "$mark",
       |  "encoding": {
       |    "x": {"field": "${esc(xField)}", "type": "$xType"},
       |    "y": {"field": "${esc(yField)}", "type": "$yType"}
       |  }
       |}""".stripMargin
  }

  /** Wrap an aggregated frame as a ChartR, validating the encoded fields
    * exist and the result is chart-sized. */
  def toChart(df: DataFrame, mark: String, xField: String, yField: String,
      title: Option[String] = None, maxRows: Int = 10000): ChartR = {
    val cols = df.columns.toSet
    for (f <- Seq(xField, yField) if !cols.contains(f))
      throw ChartSpecError(s"chart field '$f' not in result columns ${cols.mkString(", ")}")
    if (df.limit(maxRows + 1).count() > maxRows)
      throw ChartSpecError(
        s"chart data exceeds $maxRows rows — aggregate before charting")
    val yType = df.schema(yField).dataType.typeName match {
      case "string" | "boolean" => "nominal"
      case _                    => "quantitative"
    }
    val xType = df.schema(xField).dataType.typeName match {
      case "timestamp" | "date" | "timestamp_ntz" => "temporal"
      case "string" | "boolean"                   => "nominal"
      case _                                      => "quantitative"
    }
    ChartR(df, spec(mark, xField, yField, xType, yType, title))
  }
}
