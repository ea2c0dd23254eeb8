package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.TextAnalysis

class CmsSketchSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(tokens: Seq[String], depth: Int, width: Int,
      parts: Int = 4): Seq[Long] = {
    GraftFunctions.ensureRegistered(spark)
    val df = tokens.toDF("tok").repartition(parts)
    val pos = array(graft.pipeline.BloomGate.positions(
      col("tok"), width, depth, "#cms"): _*)
    df.select(pos.as("p"))
      .agg(GraftFunctions.cms(col("p"), depth, width).as("s"))
      .head().getSeq[Long](0)
  }

  test("every sketch row sums to the total occurrence count") {
    val toks = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c")
    val s = sketch(toks, depth = 3, width = 8)
    (0 until 3).foreach { i =>
      assert(s.slice(i * 8, (i + 1) * 8).sum === 10L, s"row $i")
    }
  }

  test("merge across partitions matches single partition") {
    val toks = (1 to 500).map(i => s"t${i % 37}")
    assert(sketch(toks, 3, 16, parts = 8) === sketch(toks, 3, 16, parts = 1))
  }

  test("point query never underestimates, and is exact at generous width") {
    val docs = Seq((1L, "alpha alpha alpha beta beta gamma")).toDF("id", "text")
    val wide = TextAnalysis.cmsTokenFrequencies(docs, "text",
      depth = 4, width = 1024)
      .orderBy("term").collect()
    // 3 terms in 1024 buckets: no collisions, est == exact
    wide.foreach(r => assert(r.getLong(2) === r.getLong(1), r.toString))
    val narrow = TextAnalysis.cmsTokenFrequencies(docs, "text",
      depth = 2, width = 2)
      .orderBy("term").collect()
    narrow.foreach(r => assert(r.getLong(2) >= r.getLong(1), r.toString))
  }
}
