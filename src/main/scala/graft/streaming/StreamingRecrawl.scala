package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.pipeline.Recrawl

/** Streaming serving-layout maintenance — the CDC form of
  * [[graft.pipeline.Recrawl.advance]]: a crawler (or any
  * change-data-capture feed) emits per-page delta rows
  * `(id, text, op)` with op ∈ {"upsert", "delete"}, and every
  * micro-batch advances all registered serving layouts through their
  * generation-aware lifecycle ops. Serving reflects each micro-batch
  * as soon as it commits; compaction stays an offline cadence job
  * ([[graft.pipeline.Recrawl.compact]]) exactly as in the batch loop —
  * a streaming ingest never rewrites layout files.
  *
  * Per-micro-batch semantics are [[graft.pipeline.Recrawl.advance]]'s:
  * upserts of indexed ids retire the old generation and append the
  * new, fresh ids just append, deletes tombstone every live version.
  * Contract: at most ONE op per id per micro-batch (a CDC feed that
  * can emit several must pre-compact to last-write-wins upstream —
  * with two ops of the same id in one batch, their relative order
  * inside the batch frame is not defined, so neither is the outcome).
  *
  * foreachBatch bodies run sequentially on the query thread, so no
  * cross-batch state needs carrying here at all — the LAYOUTS are the
  * state, which is what makes this form restart-safe for free: after
  * a driver crash the resumed query replays the last uncommitted
  * micro-batch against the on-disk layouts, and a replayed DELETE is
  * idempotent by construction. A replayed UPSERT re-appends under a
  * fresh generation after re-tombstoning the previous one, so serving
  * stays correct too (the superseded duplicate rows cost bytes until
  * compaction, not correctness).
  */
object StreamingRecrawl {

  /** Attach the maintenance loop to a streaming delta frame with
    * columns (`idCol`, `textCol`, `opCol`). The optional `onBatch`
    * hook fires after each advance with the micro-batch id — a place
    * to schedule compaction cadence or emit metrics. */
  def maintainGate(
      deltas: DataFrame, idCol: String, textCol: String, opCol: String,
      layouts: Recrawl.ServingLayouts,
      onBatch: Long => Unit = _ => (),
  ): DataStreamWriter[Row] = {
    require(deltas.isStreaming, "maintainGate expects a streaming frame")
    deltas.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val changed = batch.where(lower(col(opCol)) =!= "delete")
          .select(col(idCol), col(textCol))
        val deleted = batch.where(lower(col(opCol)) === "delete")
          .select(col(idCol))
        Recrawl.advance(spark, changed, deleted, idCol, textCol, layouts)
        onBatch(batchId)
      }
  }
}
