package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Filter-attribution contract: the per-rule counts must add up — each
  * engineered doc fails exactly the rules it was built to fail, unique
  * attribution only counts single-rule casualties, and the totals line
  * up with the composite screen.
  */
class FilterAttributionSpec extends SparkSpec {
  import spark.implicits._

  // 60-word clean body: passes every rule at minWords=50 (mean word
  // length 4.0, no symbols, letters everywhere, stopword-rich)
  private val clean =
    Seq.fill(10)("the cats have that been with good food here man").mkString(" ")

  private def report(docs: Seq[(Long, String)]) =
    TextAnalysis.filterAttribution(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5)))
      .toMap

  test("all-clean corpus: zero drops on every rule") {
    val rep = report(Seq((1L, clean), (2L, clean), (3L, clean)))
    assert(rep.keySet == Set("alpha_frac", "mean_word_len", "stopword_hits",
      "symbol_ratio", "words_range"))
    rep.foreach { case (rule, (failed, unique, nDocs, nDropped)) =>
      assert(failed == 0L && unique == 0L, s"$rule should not fire on clean docs")
      assert(nDocs == 3L && nDropped == 0L)
    }
  }

  test("single-rule failures attribute uniquely") {
    // doc 2: too short (9 words) but otherwise clean → words_range ONLY
    val short = "the cats have that been with good food here"
    val rep = report(Seq((1L, clean), (2L, short)))
    assert(rep("words_range") == ((1L, 1L, 2L, 1L)),
      s"short doc must fail words_range alone: ${rep("words_range")}")
    assert(rep("alpha_frac")._1 == 0L && rep("symbol_ratio")._1 == 0L)
  }

  test("multi-rule failure counts everywhere but never as unique") {
    // digit soup: fails alpha_frac AND stopword_hits AND mean_word_len
    // (1-char words) — 60 words so words_range passes
    val soup = Seq.fill(60)("7").mkString(" ")
    val rep = report(Seq((1L, clean), (2L, soup)))
    assert(rep("alpha_frac")._1 == 1L && rep("alpha_frac")._2 == 0L,
      "multi-rule casualty is not unique to alpha_frac")
    assert(rep("stopword_hits")._1 == 1L && rep("stopword_hits")._2 == 0L)
    assert(rep("mean_word_len")._1 == 1L && rep("mean_word_len")._2 == 0L)
    assert(rep("words_range")._1 == 0L)
    // dropped once, despite failing three rules
    assert(rep("alpha_frac")._4 == 1L, "n_dropped counts docs, not rule hits")
  }

  test("n_dropped equals the composite screen's drop count") {
    val docs = Seq((1L, clean), (2L, "tiny doc"), (3L, Seq.fill(60)("9").mkString(" ")),
      (4L, clean))
    val rep = report(docs)
    val composite = TextAnalysis.gopherQualityRules(
      docs.toDF("doc_id", "text"), "doc_id", "text")
      .where(!col("pass")).count()
    assert(rep.values.head._4 == composite,
      s"attribution n_dropped ${rep.values.head._4} != composite $composite")
  }
}
