package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PQ-audit contracts: a rescore pool covering the corpus recovers
  * exact top-k (the ADC cut becomes vacuous), and widening the pool
  * never hurts.
  */
class PqRecallAuditSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = (0L until 120L).map { i =>
    (i, (0 until 16).map(d => ((i * 37 + d * 11) % 29) / 29.0f - 0.5f))
  }.toDF("vec_id", "embedding")

  private lazy val queries = corpus.where(pmod(col("vec_id"), lit(30)) === 0)
    .select(col("vec_id").as("qid"), col("embedding").as("qv"))

  private def mean(rescoreFactor: Int): Double =
    Similarity.pqRecallAudit(corpus, "vec_id", "embedding", queries,
      m = 2, kBook = 4, k = 5, rescoreFactor = rescoreFactor)
      .agg(avg("recall")).head().getDouble(0)

  test("a corpus-sized rescore pool recovers exact top-k") {
    assert(mean(24) == 1.0, "candidate cut >= corpus size is brute force")
  }

  test("widening the rescore pool never hurts recall") {
    val narrow = mean(2)
    val wide = mean(8)
    assert(narrow <= wide, s"narrow=$narrow wide=$wide")
    assert(wide <= 1.0)
  }
}
