package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.storage.StorageLevel

import graft.pipeline.{OperatorCache, TrainingPipeline}

/** Streaming CURATION gate: the full ingest-time screen — Bloom
  * exact-seen gate, entropy screen, quality/language floors, near-dup
  * dedup against everything already ingested, Gopher rule screen,
  * split — applied per micro-batch, with the dedup state rolling
  * FORWARD so a batch also dedups against every earlier batch, not
  * just the initial corpus. This is what a recrawl pipeline actually
  * runs at the door: [[StreamingDedup]] flags near-dups;
  * this gate emits ready-to-train rows.
  *
  * Shape: all the work happens inside `foreachBatch`, where the batch
  * is a plain DataFrame — so [[TrainingPipeline.curateIncremental]]
  * runs as-is (banded probes, codegen'd screens) and the streaming
  * engine never sees a self-join or window it can't support. The
  * per-batch corpus-side cost is the band-bucket probe + a semi-join-
  * pruned read of just the matched docs — the corpus is never
  * re-screened (the incremental contract).
  *
  * State across batches: `foreachBatch` bodies run strictly
  * sequentially on the query thread, so a plain var carries
  * [[TrainingPipeline.CurateState]] batch to batch. The state frames
  * are `localCheckpoint`ed after each advance — without that, batch N's
  * plan would embed N−1 nested unions each re-screening every prior
  * batch — and the superseded checkpoint's blocks are freed as soon as
  * the new one is materialized. On a real cluster prefer parquet state
  * tables (append the batch's post-floor docs + band postings, the
  * layout in [[TrainingPipeline.CurateState]]'s scaladoc) so the state
  * survives driver restarts; localCheckpoint state is executor-memory
  * state with the same restart caveats as any non-checkpointed stream
  * state.
  *
  * Cache lifecycle: `OperatorCache.releaseAll` runs after every batch
  * (the incremental screens materialize batch-scoped frames); the
  * state checkpoints live OUTSIDE the registry and survive it. Callers
  * must not hold their own OperatorCache-tracked frames across a
  * running gate — same contract as [[StreamingDedup.dedupGate]]'s
  * warning, enforced here by releasing inside the gate.
  */
object StreamingCurate {

  /** Attach the curation gate to a streaming document source. Each
    * micro-batch is curated against the rolling state and handed to
    * `sink` (which must materialize what it needs — the standard
    * foreachBatch contract); the state then advances past the batch.
    * Start the returned writer with `.start()` and a trigger of your
    * choice (Trigger.AvailableNow() for catch-up ingest).
    *
    * Output rows match [[TrainingPipeline.curate]]'s shape:
    * (idCol, textCol, split?). With ids monotone across batches (the
    * recrawl convention) the concatenated sink output equals
    * `curate(initialCorpus ∪ allBatches, spanK = 0)` restricted to the
    * streamed ids — asserted across micro-batch boundaries in
    * StreamingCurateSpec.
    */
  def curateGate(
      docs: DataFrame, initial: TrainingPipeline.CurateState,
      idCol: String = "doc_id", textCol: String = "text",
  )(sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    require(docs.isStreaming, "curateGate expects a streaming frame")
    var state = initial
    // the previous batch's state checkpoints — released once superseded
    var prevCleaned: DataFrame = null
    var prevIndex: DataFrame = null
    var prevSeen: DataFrame = null
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the batch feeds two passes (curate + advance) — cache it once
        val b = batch.persist(StorageLevel.MEMORY_AND_DISK)
        try {
          sink(TrainingPipeline.curateIncremental(state, b, idCol, textCol), batchId)
          val advanced = TrainingPipeline.advanceState(state, b, idCol, textCol)
          // eager checkpoint materializes the NEW state before the old
          // one's blocks are freed
          val newCleaned = advanced.cleaned.localCheckpoint()
          val newIndex = advanced.bandIndex.localCheckpoint()
          val newSeen = advanced.seenKeys.map(_.localCheckpoint())
          if (prevCleaned != null) OperatorCache.releaseCheckpoint(prevCleaned)
          if (prevIndex != null) OperatorCache.releaseCheckpoint(prevIndex)
          if (prevSeen != null) OperatorCache.releaseCheckpoint(prevSeen)
          prevCleaned = newCleaned
          prevIndex = newIndex
          prevSeen = newSeen.orNull
          state = advanced.copy(cleaned = newCleaned, bandIndex = newIndex,
            seenKeys = newSeen)
        } finally {
          // foreachBatch runs under a CLONED session — the registry key
          // for every frame the incremental screens persisted — so this
          // cannot touch caches the caller tracked under its own session
          // (e.g. the ones curateState registered while building the
          // initial state; those stay under the caller's release
          // contract)
          OperatorCache.releaseAll(b.sparkSession)
          b.unpersist(blocking = false)
        }
      }
  }
}
