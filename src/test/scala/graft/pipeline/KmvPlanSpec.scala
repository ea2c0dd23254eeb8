package graft.pipeline

import graft.SparkSpec

/** Pins the scale shapes of kmvVocabAudit's two modes: the audit mode
  * pays the two-phase distinct expansion for its exact column; the
  * production mode must NOT — its only aggregate exchange carries the
  * k-bounded sketch state.
  */
class KmvPlanSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (1 to 50)
    .map(i => (i.toLong, s"lang${i % 3}", s"tok$i shared words tok${i * 7}"))
    .toDF("doc_id", "lang", "text")

  private def aggExchanges(plan: String): Seq[String] =
    plan.split("\n").map(_.trim)
      .filter(l => l.contains("Exchange hashpartitioning"))
      .toSeq

  test("production mode (withExact=false): one stratum-keyed exchange") {
    val plan = TextAnalysis.kmvVocabAudit(docs, "lang", "text", k = 8,
      withExact = false).queryExecution.executedPlan.toString
    val ex = aggExchanges(plan)
    assert(ex.length === 1, s"expected one agg exchange, got:\n${ex.mkString("\n")}")
    assert(!ex.head.contains("h#"),
      s"sketch-mode exchange must not be keyed by the hash column: ${ex.head}")
  }

  test("audit mode still computes the exact column") {
    val rows = TextAnalysis.kmvVocabAudit(docs, "lang", "text", k = 8)
      .orderBy("stratum").collect()
    assert(rows.forall(!_.isNullAt(1)))
  }

  test("production mode returns null n_exact but a live estimate") {
    val rows = TextAnalysis.kmvVocabAudit(docs, "lang", "text", k = 8,
      withExact = false).orderBy("stratum").collect()
    assert(rows.forall(_.isNullAt(1)))
    assert(rows.forall(_.getDouble(4) > 0.0))
  }

  test("both modes agree on the sketch columns") {
    val a = TextAnalysis.kmvVocabAudit(docs, "lang", "text", k = 8)
      .select("stratum", "n_retained", "kth_hash", "est_distinct")
      .orderBy("stratum").collect().toSeq
    val b = TextAnalysis.kmvVocabAudit(docs, "lang", "text", k = 8,
      withExact = false)
      .select("stratum", "n_retained", "kth_hash", "est_distinct")
      .orderBy("stratum").collect().toSeq
    assert(a === b)
  }
}
