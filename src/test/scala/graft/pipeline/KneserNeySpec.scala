package graft.pipeline

import graft.SparkSpec

class KneserNeySpec extends SparkSpec {
  import spark.implicits._

  test("matches the hand-derived interpolated KN value") {
    // corpus "a b c a b d": trigram types abc, bca, cab, abd all once.
    // hist(a,b) = (h=2, n1f=2); hist(b,c) = hist(c,a) = (1, 1).
    // cont2 types (b,c),(c,a),(a,b),(b,d) all 1; N1+(••)=4; every
    // unigram continuation count is 1.
    val D = 0.75
    val puni = 1.0 / 4.0
    def pbi(n1l: Double, midtot: Double, nfol2: Double) =
      math.max(n1l - D, 0) / midtot + D * nfol2 / midtot * puni
    def ptri(c3: Double, h: Double, n1f: Double, pb: Double) =
      math.max(c3 - D, 0) / h + D * n1f / h * pb
    val pCab = ptri(1, 2, 2, pbi(1, 2, 2)) // P(c|ab) = P(d|ab)
    val pAbc = ptri(1, 1, 1, pbi(1, 1, 1)) // P(a|bc) = P(b|ca)
    val expected = BigDecimal(
      -(2 * math.log(pCab) + 2 * math.log(pAbc)) / 4.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    val out = TextAnalysis.kneserNeyTrigramNll(
      Seq((1L, "a b c a b d")).toDF("doc_id", "text"), "doc_id", "text")
      .head()
    assert(out.getLong(1) === 4L)
    assert(out.getDouble(2) === expected)
  }

  test("interpolation reserves mass: observed continuations sum below 1") {
    // P(c|ab) + P(d|ab) = 2 * 0.359375 < 1 — the discounted mass backs
    // off to unseen continuations instead of overfitting the context
    val pCab = 0.25 / 2 + 0.75 * 2 / 2 * (0.25 / 2 + 0.75 * 2 / 2 * 0.25)
    assert(pCab * 2 < 1.0)
  }

  test("docs with fewer than three tokens are absent") {
    val out = TextAnalysis.kneserNeyTrigramNll(
      Seq((1L, "only two"), (2L, "one two three four")).toDF("doc_id", "text"),
      "doc_id", "text").select("doc").as[Long].collect()
    assert(out === Array(2L))
  }

  test("repetitive docs score lower NLL than novel-gram docs") {
    val out = TextAnalysis.kneserNeyTrigramNll(
      Seq(
        (1L, "x y z x y z x y z x y z"),
        (2L, "q w e r t u i o p a s d")).toDF("doc_id", "text"),
      "doc_id", "text")
      .orderBy("doc").select("nll").as[Double].collect()
    assert(out(0) < out(1))
  }
}
