package graft.api

import scala.annotation.nowarn
import scala.collection.mutable
import graft.SparkSpec
import graft.agent.FakeLlm
import graft.response.DataFrameR

/** v2 compat shims: construction warns, chat delegates
  * (reference: smart_dataframe/__init__.py, smart_datalake/__init__.py). */
@nowarn("cat=deprecation")
class SmartSpec extends SparkSpec {

  private def captureWarnings[A](body: => A): (A, Seq[String]) = {
    val buf = mutable.Buffer.empty[String]
    val prev = SmartCompat.warn
    SmartCompat.warn = buf += _
    try (body, buf.toSeq) finally SmartCompat.warn = prev
  }

  test("SmartDataframe warns on construction and chats through the agent") {
    val region = spark.read.parquet(s"$sf/region.parquet")
    val (sdf, warnings) = captureWarnings {
      new SmartDataframe(region, name = Some("region"))(
        new FakeLlm(Seq("SELECT r_name FROM region ORDER BY r_name")))
    }
    assert(warnings.size == 1)
    assert(warnings.head.contains("DEPRECATION WARNING"))
    assert(warnings.head.contains("SmartDataframe will soon be deprecated"))

    val resp = sdf.chat("list region names")
    assert(resp.isInstanceOf[DataFrameR])
    assert(resp.asInstanceOf[DataFrameR].value.count() == 5)
    assert(sdf.lastPrompt.exists(_.contains("list region names")))
    assert(sdf.lastCodeGenerated.contains("SELECT r_name FROM region ORDER BY r_name"))
  }

  test("SmartDataframe head surfaces") {
    val region = spark.read.parquet(s"$sf/region.parquet")
    val (sdf, _) = captureWarnings {
      new SmartDataframe(region)(new FakeLlm(Seq("SELECT 1")))
    }
    assert(sdf.count() == 5)
    assert(sdf.headDf.count() == 5)
    val csv = sdf.headCsv
    assert(csv.linesIterator.next() == region.columns.mkString(","))
    assert(csv.linesIterator.size == 6)
  }

  test("SmartDatalake registers every frame and supports clearMemory") {
    val region = spark.read.parquet(s"$sf/region.parquet")
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val (lake, warnings) = captureWarnings {
      new SmartDatalake(Seq("region" -> region, "nation" -> nation))(
        new FakeLlm(Seq(
          "SELECT r_name, n_name FROM region JOIN nation ON r_regionkey = n_regionkey")))
    }
    assert(warnings.head.contains("SmartDatalake will be deprecated soon"))

    val resp = lake.chat("nations per region")
    assert(resp.asInstanceOf[DataFrameR].value.count() == 25)
    assert(lake.memory.count == 2)
    lake.clearMemory()
    assert(lake.memory.count == 0)
  }
}
