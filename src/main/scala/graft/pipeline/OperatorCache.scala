package graft.pipeline

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped registry for the frames operators persist internally
  * (shingle frames, IVF assignments, (doc, term, tf) aggregates).
  *
  * Spark offers no reliable post-action unpersist hook when an operator
  * returns a lazy frame — the caller decides when the result is
  * materialized — so intra-operator caching is right but the cache's
  * LIFETIME has to be the caller's call. Every operator persist routes
  * through [[persist]], which tracks the frame per session; a long-lived
  * session (the bench, a service, a notebook) calls [[releaseAll]] once
  * the results it needs are materialized, and the storage footprint goes
  * back to zero instead of growing monotonically for the life of the
  * session. (Round-4 lesson: 6+ never-released MEMORY_AND_DISK frames
  * across a 35-query bench session degraded unrelated queries up to 9.8×.)
  */
object OperatorCache {
  private val registry =
    new ConcurrentHashMap[SparkSession, java.util.Set[DataFrame]]()

  /** Persist `df` (MEMORY_AND_DISK by default) and track it for later
    * release. Returns `df` for chaining.
    */
  def persist(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    df.persist(level)
    registry
      .computeIfAbsent(df.sparkSession,
        _ => ConcurrentHashMap.newKeySet[DataFrame]())
      .add(df)
    evictStopped()
    df
  }

  /** [[persist]] + eager materialization (one count() populating every
    * cache partition) — the barrier form for frames whose consumers
    * include BROADCAST exchange branches. Broadcast exchanges execute as
    * independent jobs on separate threads; when several of them consume
    * the same lazily-persisted frame before any has populated its cache,
    * each job recomputes the frame's full plan from scratch (block-level
    * dedup only helps after a winner commits a partition). Measured on
    * p13_neardup_dedup: the shingle-set aggregate ran up to 6× per call
    * as concurrent ~1.3s duplicate jobs, swinging the cold cost 2.7–9.9s
    * run to run. The count() pass costs the frame's one honest
    * computation and makes every downstream branch a cache read.
    */
  def materialize(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    persist(df, level)
    df.count()
    df
  }

  /** Unpersist every frame this registry tracked for `spark`. Non-blocking
    * (the block manager frees asynchronously); safe to call when nothing
    * is tracked. Loops until the session has no entry, so a persist()
    * racing in from another thread is still released rather than stranded.
    */
  def releaseAll(spark: SparkSession): Unit = {
    var frames = registry.remove(spark)
    while (frames != null) {
      frames.forEach(df => df.unpersist(blocking = false))
      frames = registry.remove(spark)
    }
    evictStopped()
  }

  /** Drop registry entries whose session has been stopped — their block
    * stores are gone with the SparkContext, but the strong references
    * here would otherwise pin the session object for the JVM's life.
    */
  private def evictStopped(): Unit =
    registry.keySet.forEach { s =>
      if (s.sparkContext.isStopped) registry.remove(s)
    }

  /** Number of frames currently tracked for `spark` (test/diagnostic). */
  def trackedCount(spark: SparkSession): Int = {
    val s = registry.get(spark)
    if (s == null) 0 else s.size()
  }
}
