package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.storage.StorageLevel

import graft.pipeline.Dedup

/** Streaming near-dup gate: every incoming document micro-batch is
  * checked against a PERSISTED corpus band index (see
  * [[graft.pipeline.Dedup.bandIndex]]) and annotated with its verified
  * near-duplicates before it reaches the training corpus — the streaming
  * form of the decontamination/dedup screen a continuously-ingesting
  * training pipeline runs (reference scope: grishasen/pandas-ai has no
  * streaming surface; this extends the batch operators in Dedup.scala).
  *
  * Shape: the work happens per micro-batch inside `foreachBatch`, where
  * the batch is a plain DataFrame — so the BATCH candidate machinery
  * (explode + window-lead shingles, wide min-aggregate signatures,
  * banded equi-join probe) runs as-is, fully codegen'd. The streaming
  * engine's own operators never see a window or a self-join, both of
  * which are unsupported/stateful on streams. The corpus side is a
  * static frame probed per batch (bucket-pruned when the index is laid
  * out by (band, band_hash)); the corpus is NEVER re-hashed — cost per
  * batch is O(batch · bands) map-side plus the bucket joins, the same
  * incremental contract as [[Dedup.incrementalCandidates]].
  */
object StreamingDedup {

  /** Verified near-dup pairs between one document batch and the indexed
    * corpus: banded candidates from the index probe, then exact-Jaccard
    * verification ≥ threshold. `corpusSets` carries the corpus shingle
    * sets keyed `(sid, sset)` (persist this next to the index —
    * recomputing it per batch would re-scan the corpus text and defeat
    * the incremental design).
    *
    * @return (doc_a = corpus doc, doc_b = batch doc, jaccard)
    */
  def flagBatch(
      index: DataFrame, corpusSets: DataFrame, batch: DataFrame,
      idCol: String, textCol: String,
      threshold: Double, shingleK: Int, numHashes: Int, bands: Int,
  ): DataFrame =
    flagBatchFromShingles(index, corpusSets,
      Dedup.shingleRows(batch, idCol, textCol, shingleK),
      threshold, numHashes, bands)

  private def flagBatchFromShingles(
      index: DataFrame, corpusSets: DataFrame, batchShingles: DataFrame,
      threshold: Double, numHashes: Int, bands: Int,
  ): DataFrame = {
    val cands = Dedup.incrementalCandidatesFrom(index, batchShingles, numHashes, bands)
    val batchSets = Dedup.shingleSetsFrom(batchShingles)
    cands
      .join(corpusSets.withColumnRenamed("sid", "doc_a")
        .withColumnRenamed("sset", "set_a"), "doc_a")
      .join(batchSets.withColumnRenamed("sid", "doc_b")
        .withColumnRenamed("sset", "set_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(Dedup.jaccard(col("set_a"), col("set_b")), 6).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Attach the dedup gate to a streaming document source: per
    * micro-batch, batch docs are annotated `is_dup` (true when a verified
    * corpus near-dup exists) and handed to `sink` with the batch id —
    * route clean rows to the corpus and dups to a quarantine from there.
    * Start the returned writer with `.start()` (and a checkpoint
    * location for exactly-once sinks). The sink must materialize what it
    * needs within the call (the standard foreachBatch contract).
    *
    * Cache lifecycle: the batch-side shingle frame feeds two consumers
    * (candidates + verification sets), so it is persisted for the batch
    * and unpersisted before the next one — DIRECTLY, not through
    * OperatorCache.releaseAll, which would also drop the caller's
    * long-lived index/set caches and force a corpus re-hash per batch.
    */
  def dedupGate(
      docs: DataFrame, index: DataFrame, corpusSets: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      threshold: Double = 0.7, shingleK: Int = 3,
      numHashes: Int = 32, bands: Int = 16,
  )(sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    require(docs.isStreaming, "dedupGate expects a streaming frame")
    // no trigger is set: callers pick one on the returned writer
    // (Trigger.AvailableNow() for catch-up-and-stop ingest jobs, the
    // default micro-batch trigger for continuous gating)
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sh = Dedup.shingleRows(batch, idCol, textCol, shingleK)
          .persist(StorageLevel.MEMORY_AND_DISK)
        try {
          val dups = flagBatchFromShingles(index, corpusSets, sh,
            threshold, numHashes, bands)
            .select(col("doc_b").as("__dup_id")).distinct()
          val flagged = batch.join(dups,
            batch(idCol) === col("__dup_id"), "left_outer")
            .withColumn("is_dup", col("__dup_id").isNotNull)
            .drop("__dup_id")
          sink(flagged, batchId)
        } finally {
          sh.unpersist(blocking = false)
        }
      }
  }
}
