package graft.pipeline

import graft.SparkSpec

/** Canonical-selection contract: the cluster keeps its best-quality
  * member (NOT the min id), ties break to the min id, singletons
  * survive as their own cluster, and the cluster label stays the
  * min-id representative so runs remain joinable across policies.
  */
class CanonicalSelectionSpec extends SparkSpec {
  import spark.implicits._

  // Docs 10/11/12 are near-identical (one cluster). Doc 11 is the
  // longest/cleanest copy → highest quality score; 10 is the min id.
  // Doc 50 is unrelated.
  private val core = "the quick brown fox jumps over the lazy dog near the old stone bridge every day"
  private lazy val docs = Seq(
    (10L, core),
    (11L, core + " and a happy farmer waves"),
    (12L, core + " x"),
    (50L, "completely different text about spark shuffles and catalyst optimizer rules working"),
  ).toDF("doc_id", "text")

  private def result(threshold: Double = 0.4) =
    Dedup.canonicalByQuality(docs, "doc_id", "text", threshold = threshold)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap

  test("cluster keeps the max-quality member, labeled by min id") {
    val m = result()
    assert(m.contains(10L), s"cluster label must be the min id: ${m.keySet}")
    val (nMembers, keptDoc, keptScore) = m(10L)
    assert(nMembers == 3L, s"cluster must have 3 members, got $nMembers")
    // doc 11 has the most words → highest length component of quality
    assert(keptDoc == 11L, s"kept doc should be the high-quality 11, got $keptDoc")
    val scores = TextAnalysis.qualityScore(org.apache.spark.sql.functions.col("text"))
    val s11 = docs.where($"doc_id" === 11L).select(scores).head().getDouble(0)
    assert(keptScore == s11)
  }

  test("singletons come back as their own cluster") {
    val m = result()
    assert(m(50L) == ((1L, 50L, m(50L)._3)))
    assert(m.size == 2, s"expected 2 clusters, got ${m.keySet}")
  }

  test("quality ties break to the min id") {
    val same = Seq((7L, core), (3L, core)).toDF("doc_id", "text")
    val m = Dedup.canonicalByQuality(same, "doc_id", "text", threshold = 0.4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(m == Map(3L -> 3L), s"identical docs: label 3, keep 3: $m")
  }
}
