package graft.pipeline

import graft.SparkSpec

/** Co-occurrence/PMI contract: exact doc-frequency and pair counts,
  * hand-checked PMI, and a genuinely active Apriori prune (a token
  * below support must never reach the pair stage).
  */
class CooccurrencePmiSpec extends SparkSpec {
  import spark.implicits._

  // alpha+beta co-occur in 3 docs; gamma appears in 2; rare in 1
  private lazy val docs = Seq(
    (1L, "alpha beta gamma"),
    (2L, "alpha beta"),
    (3L, "alpha beta gamma rare"),
    (4L, "alpha"),
  ).toDF("doc_id", "text")

  private def run(minSupport: Long) =
    TextAnalysis.cooccurrencePmi(docs, "doc_id", "text", minSupport)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap

  test("exact pair counts and doc frequencies") {
    val m = run(2L)
    // df: alpha 4, beta 3, gamma 2; pairs with support >= 2
    assert(m(("alpha", "beta")) == ((3L, 4L, 3L, m(("alpha", "beta"))._4)))
    assert(m(("alpha", "gamma"))._1 == 2L)
    assert(m(("beta", "gamma"))._1 == 2L)
    assert(!m.contains(("beta", "alpha")), "pairs are canonical tok_a < tok_b")
    assert(m.keySet == Set(("alpha", "beta"), ("alpha", "gamma"), ("beta", "gamma")))
  }

  test("PMI matches the hand formula on exact counts") {
    val m = run(2L)
    // PMI(alpha,beta) = ln(n_ab * N / (df_a * df_b)) = ln(3*4/(4*3)) = 0
    assert(m(("alpha", "beta"))._4 == 0.0)
    // PMI(alpha,gamma) = ln(2*4/(4*2)) = 0; PMI(beta,gamma)=ln(2*4/(3*2))
    val expected = BigDecimal(math.log(8.0 / 6.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(m(("beta", "gamma"))._4 == expected)
  }

  test("Apriori prune: sub-support tokens never pair") {
    val m = run(3L)
    // gamma (df=2) and rare (df=1) are pruned before the self-join
    assert(m.keySet == Set(("alpha", "beta")))
    // raising support above every pair count empties the result
    assert(run(5L).isEmpty)
  }

  test("multiple occurrences in one doc count once (document frequency)") {
    val rep = Seq((1L, "alpha alpha beta beta"), (2L, "alpha beta")).toDF("doc_id", "text")
    val m = TextAnalysis.cooccurrencePmi(rep, "doc_id", "text", 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m(("alpha", "beta")) == 2L, "per-doc dedupe before pairing")
  }
}
