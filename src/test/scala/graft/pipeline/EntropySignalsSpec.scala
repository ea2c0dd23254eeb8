package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class EntropySignalsSpec extends SparkSpec {
  import spark.implicits._

  private def signals(rows: Seq[(Long, String)]) =
    TextAnalysis.entropySignals(rows.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc")

  test("uniform two-char doc has exactly 1 bit of entropy") {
    val Row(_, n, d, top, h, suspect) =
      signals(Seq((1L, "abababab"))).head()
    assert(n === 8L)
    assert(d === 2L)
    assert(top === 0.5)
    assert(h === 1.0)
    assert(suspect === true) // 1.0 < 2.5 and top 0.5 > 0.25
  }

  test("single repeated char: zero entropy, top fraction 1") {
    val Row(_, n, d, top, h, suspect) = signals(Seq((1L, "aaaa"))).head()
    assert(n === 4L && d === 1L && top === 1.0 && h === 0.0)
    assert(suspect === true)
  }

  test("empty and null docs report all-zero signals") {
    val df = Seq((1L, ""), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = TextAnalysis.entropySignals(df, "doc_id", "text")
      .orderBy("doc").collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getLong(1) === 0L && r.getLong(2) === 0L)
      assert(r.getDouble(3) === 0.0 && r.getDouble(4) === 0.0)
    }
  }

  test("codepoint semantics: surrogate-paired emoji count as one char") {
    // "😀😀" = 2 codepoints of one kind; a UTF-16-code-unit split would
    // see 2 distinct surrogate halves x2 and report entropy 1.0
    val Row(_, n, d, _, h, _) = signals(Seq((1L, "😀😀"))).head()
    assert(n === 2L, "emoji must not split into surrogate halves")
    assert(d === 1L)
    assert(h === 0.0)
  }

  test("ordinary prose is not suspect") {
    val r = signals(Seq((1L, "The quick brown fox jumps over the lazy dog"))).head()
    val (top, h, suspect) = (r.getDouble(3), r.getDouble(4), r.getBoolean(5))
    assert(h > 3.0, s"prose entropy was $h")
    assert(suspect === false, s"top=$top h=$h")
  }
}
