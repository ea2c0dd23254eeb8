package graft.pipeline

import graft.SparkSpec

/** LSH-audit contracts: the card's counts are internally consistent,
  * planted high-similarity pairs are always found (recall 1 on them),
  * and disjoint corpora report a clean zero card.
  */
class LshRecallAuditSpec extends SparkSpec {
  import spark.implicits._

  private val core = "the quick brown fox jumps over the lazy dog near the old stone bridge every day"

  test("planted near-dups: found by the banding, counts consistent") {
    val docs = ((0L until 30L).map(i =>
      (i, s"unique document $i about subject ${i % 11} with words of its own $i")) ++
      Seq((100L, core), (101L, core + " x"), (102L, core + " y")))
      .toDF("doc_id", "text")
    val r = Dedup.lshRecallAudit(docs, "doc_id", "text", threshold = 0.5).collect().head
    val (nExact, nCand, nHit, nMissed) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nExact >= 3, s"the 3 planted docs form >= 3 exact pairs: $nExact")
    assert(nMissed == 0 && r.getDouble(4) == 1.0,
      s"high-similarity pairs must never be missed: missed=$nMissed")
    assert(nHit <= nCand && nHit <= nExact && nExact - nHit == nMissed)
    OperatorCache.releaseAll(spark)
  }

  test("disjoint corpus: zero exact pairs, null recall (not a crash)") {
    val docs = (0L until 12L).map(i =>
      (i, s"totally distinct number$i words$i phrasing$i content$i here$i"))
      .toDF("doc_id", "text")
    val r = Dedup.lshRecallAudit(docs, "doc_id", "text", threshold = 0.5).collect().head
    assert(r.getLong(0) == 0L && r.getLong(3) == 0L)
    assert(r.isNullAt(4), "0/0 recall is null under ANSI")
    OperatorCache.releaseAll(spark)
  }
}
