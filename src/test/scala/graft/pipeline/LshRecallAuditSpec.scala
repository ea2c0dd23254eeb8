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

  test("sampled audit estimates full-sweep recall on planted pairs") {
    // plant a near-dup pair at EVERY id so any hash-gated sample
    // contains planted pairs: docs 2i and 2i+1 share a long core and
    // differ by one token → Jaccard well above threshold
    val docs = (0L until 40L).flatMap { i =>
      val c = s"$core cluster${i} theme${i % 7}"
      Seq((2 * i, c), (2 * i + 1, c + s" tail${i}"))
    }.toDF("doc_id", "text")
    val full = Dedup.lshRecallAudit(docs, "doc_id", "text", threshold = 0.5)
      .collect().head
    val sampled = Dedup.lshRecallAudit(docs, "doc_id", "text", threshold = 0.5,
      sampleFraction = Some(0.5), maxDocFreq = Some(64)).collect().head
    // full sweep finds every planted pair; the sampled sweep must agree
    // on the ESTIMATE (recall 1.0) while auditing a strict subset
    assert(full.getDouble(4) == 1.0, s"full recall: ${full.getDouble(4)}")
    assert(sampled.getLong(0) > 0 && sampled.getLong(0) < full.getLong(0),
      s"sample audits a non-trivial strict subset: ${sampled.getLong(0)} of ${full.getLong(0)}")
    assert(sampled.getDouble(4) == 1.0,
      s"sampled recall estimates the full-sweep number: ${sampled.getDouble(4)}")
    OperatorCache.releaseAll(spark)
  }

  test("maxDocFreq bounds the inverted index without losing planted pairs") {
    // planted pairs share rare cluster shingles; the short common
    // prefix's shingles (df = corpus size) are exactly what the cap
    // drops — and cross-cluster pairs sharing ONLY those sit far below
    // the threshold, so the capped index discovers the same pair set
    val docs = (0L until 20L).flatMap { i =>
      val c = s"common filler words here " +
        (0 until 12).map(w => s"c${i}w${w}").mkString(" ")
      Seq((2 * i, c), (2 * i + 1, c + s" tail${i}"))
    }.toDF("doc_id", "text")
    val full = Dedup.lshRecallAudit(docs, "doc_id", "text", threshold = 0.5)
      .collect().head
    val capped = Dedup.lshRecallAudit(docs, "doc_id", "text", threshold = 0.5,
      maxDocFreq = Some(6)).collect().head
    // every planted pair shares rare (df=2) shingles, so the capped
    // index still discovers all of them; the candidate side is
    // untouched by the cap
    assert(capped.getLong(0) == full.getLong(0),
      s"capped exact pairs ${capped.getLong(0)} vs full ${full.getLong(0)}")
    assert(capped.getLong(1) == full.getLong(1), "banding side unaffected by the cap")
    assert(capped.getDouble(4) == 1.0)
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
