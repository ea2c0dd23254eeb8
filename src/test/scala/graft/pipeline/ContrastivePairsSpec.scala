package graft.pipeline

import graft.SparkSpec

/** Contrastive-pair contracts: positives are exactly the near-dup
  * pairs, negatives come from the deterministic gate sampler and never
  * overlap the positives, and both carry honest Jaccard labels.
  */
class ContrastivePairsSpec extends SparkSpec {
  import spark.implicits._

  private val core = "the quick brown fox jumps over the lazy dog near the old stone bridge"
  private lazy val docs = ((0L until 20L).map(i =>
    (i, s"document number $i about topic ${i % 7} with its own words variant $i")) ++
    Seq((100L, core), (101L, core + " x"))).toDF("doc_id", "text")

  private lazy val out = Curation.contrastivePairs(docs, "doc_id", "text",
    threshold = 0.4, buckets = 4)
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))

  test("positives are the near-dup pairs with their Jaccard") {
    val pos = out.filter(_._4 == 1)
    assert(pos.exists(p => p._1 == 100L && p._2 == 101L && p._3 >= 0.4),
      s"the planted near-dup must be a positive: ${pos.toSeq}")
    assert(pos.forall(_._3 >= 0.4), "every positive's Jaccard meets the threshold")
  }

  test("negatives never repeat a positive pair and sit below the threshold") {
    val pos = out.filter(_._4 == 1).map(p => (p._1, p._2)).toSet
    val neg = out.filter(_._4 == 0)
    assert(neg.nonEmpty, "sampler must produce negatives")
    assert(neg.forall(n => !pos.contains((n._1, n._2))), "no pair carries both labels")
    assert(neg.forall(_._3 < 0.4),
      s"anti-join must remove threshold crossers: ${neg.filter(_._3 >= 0.4).toSeq}")
  }

  test("the pair set is deterministic across runs and partitionings") {
    val again = Curation.contrastivePairs(docs.repartition(7), "doc_id", "text",
      threshold = 0.4, buckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(out.toSet == again.toSet)
  }

  test("docs below the shingle floor drop from both sides") {
    val tiny = (Seq((1L, "one two"), (2L, "three four")) ++
      (10L until 20L).map(i => (i, s"real document $i with enough tokens here")))
      .toDF("doc_id", "text")
    val pairs = Curation.contrastivePairs(tiny, "doc_id", "text",
      threshold = 0.4, buckets = 2)
      .collect().map(r => Set(r.getLong(0), r.getLong(1))).toSet
    assert(pairs.forall(p => !p.contains(1L) && !p.contains(2L)),
      s"sub-shingle docs have no set to verify against: $pairs")
  }
}
