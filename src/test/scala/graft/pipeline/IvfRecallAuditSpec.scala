package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** IVF-audit contracts: probing every cell IS brute force (recall 1),
  * fewer probes can only lose recall, and the card covers the whole
  * workload.
  */
class IvfRecallAuditSpec extends SparkSpec {
  import spark.implicits._

  // deterministic 8-dim corpus: 4 loose clusters
  private lazy val corpus = (0L until 200L).map { i =>
    val c = (i % 4).toInt
    (i, (0 until 8).map(d =>
      (if (d % 4 == c) 1.0f else 0.0f) + ((i * 31 + d * 7) % 13) / 100.0f))
  }.toDF("vec_id", "embedding")

  private lazy val queries = corpus.where(pmod(col("vec_id"), lit(40)) === 0)
    .select(col("vec_id").as("qid"), col("embedding").as("qv"))

  test("probing all cells recovers exact top-k everywhere") {
    val r = Similarity.ivfRecallAudit(corpus, "vec_id", "embedding", queries,
      k = 10, ivfK = 4, nprobe = 4)
    val rows = r.collect()
    assert(rows.length == 5, s"one row per query: ${rows.length}")
    assert(rows.forall(_.getDouble(2) == 1.0),
      s"nprobe = ivfK probes every cell: ${rows.map(_.getDouble(2)).toSeq}")
  }

  test("a corpus smaller than k still reports perfect recall") {
    // recall normalizes by the per-query EXACT row count, not the
    // literal k: a 6-vector corpus with k=10 has 6 exact rows per
    // query, and an all-cells probe finds all 6 → recall 1.0 (a /k
    // denominator would understate it as 0.6)
    val tiny = corpus.where(col("vec_id") < 6)
    val r = Similarity.ivfRecallAudit(tiny, "vec_id", "embedding",
      queries.limit(1), k = 10, ivfK = 2, nprobe = 2).collect()
    assert(r.length == 1 && r.head.getLong(1) == 6L && r.head.getDouble(2) == 1.0,
      s"got ${r.toSeq}")
  }

  test("fewer probes never beat more probes") {
    def mean(nprobe: Int): Double =
      Similarity.ivfRecallAudit(corpus, "vec_id", "embedding", queries,
        k = 10, ivfK = 4, nprobe = nprobe)
        .agg(avg("recall")).head().getDouble(0)
    val one = mean(1)
    val all = mean(4)
    assert(all == 1.0 && one <= all, s"nprobe=1 $one vs all $all")
  }
}
