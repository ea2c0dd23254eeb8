package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.{OperatorCache, TrainingPipeline}

/** The streaming curation gate must equal the BATCH curate over the
  * same data — across micro-batch boundaries, where the rolling state
  * (not the initial corpus) is what catches cross-batch duplicates.
  */
class StreamingCurateSpec extends SparkSpec {
  import spark.implicits._

  private def sentence(tag: String) =
    s"the $tag morning report describes how the valley weather shifted " +
      s"over seven quiet days while local farmers watched the $tag clouds drift"

  test("streamed curate ≡ batch curate across micro-batch boundaries") {
    val prev = Seq(
      1L -> sentence("alpha"),
      2L -> sentence("bravo"),
    ).toDF("doc_id", "text")
    val state = TrainingPipeline.curateState(prev, "doc_id", "text",
      minQuality = 0.3, minWords = 5, dedupThreshold = 0.7)

    val batch1 = Seq(
      10L -> (sentence("alpha") + " again"),   // near-dup of the initial corpus → dropped
      11L -> sentence("charlie"),              // fresh → survives
      12L -> (sentence("charlie") + " also"),  // in-batch dup of 11 → dropped
      13L -> "!!! ??? !!! ??? !!!",            // quality floor
    )
    val batch2 = Seq(
      20L -> (sentence("charlie") + " more"),  // CROSS-BATCH dup of batch 1's 11 → dropped
      21L -> (sentence("charlie") + " also!"), // cross-batch dup of batch 1's DEDUP-DROPPED 12 → dropped
      22L -> sentence("bravo"),                // exact copy of initial raw → Bloom-gated
      23L -> sentence("delta"),                // fresh → survives
      24L -> "short text only",                // Gopher word floor
    )

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val streamed = ArrayBuffer.empty[(Long, String, String)]
    val q = StreamingCurate.curateGate(
      mem.toDF().toDF("doc_id", "text"), state) { (curated, _) =>
      streamed ++= curated.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    }.start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      val afterBatch1 = streamed.map(_._1).sorted.toSeq
      assert(afterBatch1 == Seq(11L), s"batch 1 gate: $afterBatch1")
      mem.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val got = streamed.sortBy(_._1).toSeq
    assert(got.map(_._1) == Seq(11L, 23L), s"gated ids: ${got.map(_._1)}")

    // ground truth: one batch curate over EVERYTHING, restricted to the
    // streamed ids (monotone across prev → batch1 → batch2)
    val full = TrainingPipeline.curate(
      prev.union((batch1 ++ batch2).toDF("doc_id", "text")),
      "doc_id", "text", minQuality = 0.3, minWords = 5,
      dedupThreshold = 0.7, spanK = 0)
      .where(col("doc_id") >= 10L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1).toSeq
    OperatorCache.releaseAll(spark)
    assert(got == full,
      s"stream gate must equal the batch curate: streamed=$got full=$full")
  }

  test("the gate releases its batch-scoped caches but keeps rolling state alive") {
    val prev = Seq(1L -> sentence("alpha")).toDF("doc_id", "text")
    val state = TrainingPipeline.curateState(prev, "doc_id", "text",
      minQuality = 0.3, minWords = 5, dedupThreshold = 0.7)
    // building the state may register caches under THIS session (the
    // normal OperatorCache caller contract); the gate must add nothing
    // on top of that baseline — its per-batch frames live under the
    // foreachBatch clone session and die inside the gate
    val baseline = OperatorCache.trackedCount(spark)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    var batches = 0
    val q = StreamingCurate.curateGate(
      mem.toDF().toDF("doc_id", "text"), state) { (curated, _) =>
      curated.collect(); batches += 1
    }.start()
    try {
      mem.addData(10L -> sentence("echo"))
      q.processAllAvailable()
      mem.addData(20L -> (sentence("echo") + " twice"), 21L -> sentence("golf"))
      q.processAllAvailable()
      mem.addData(30L -> (sentence("golf") + " thrice"))
      q.processAllAvailable()
    } finally q.stop()
    assert(batches == 3)
    // every batch-scoped operator frame was released inside the gate
    assert(OperatorCache.trackedCount(spark) == baseline,
      "the gate must not leak operator caches across batches")
    OperatorCache.releaseAll(spark)
  }
}
