package graft.pipeline

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.rdd.RDD
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
  // localCheckpoint blocks live OUTSIDE the DataFrame cache manager (the
  // checkpointed RDD itself holds the storage), so they need their own
  // ledger — before this existed, every nearDupClusters call stranded
  // MEMORY_AND_DISK blocks that only ContextCleaner GC could free
  private val rddRegistry =
    new ConcurrentHashMap[SparkSession, java.util.Set[RDD[_]]]()

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

  /** The materialized RDD behind a `localCheckpoint()`-ed frame, if the
    * frame IS a bare checkpoint (its plan is the single LogicalRDD leaf
    * the checkpoint produced — a projection/filter over one returns
    * None; track the checkpoint frame itself, not a derivation).
    */
  private def checkpointRddOf(df: DataFrame): Option[RDD[_]] =
    df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => Some(lr.rdd)
      case _                                             => None
    }

  /** Track a checkpointed frame's backing RDD so [[releaseAll]] frees its
    * storage blocks with everything else. IMPORTANT contract difference
    * from [[persist]]: a checkpoint's lineage is TRUNCATED — after
    * release the frame (and anything derived from it) is unusable, not
    * merely uncached. Operators only track checkpoints whose lifetime is
    * the caller's call, same as every other frame here.
    */
  def trackCheckpoint(df: DataFrame): DataFrame = {
    checkpointRddOf(df).foreach { rdd =>
      rddRegistry
        .computeIfAbsent(df.sparkSession,
          _ => ConcurrentHashMap.newKeySet[RDD[_]]())
        .add(rdd)
    }
    evictStopped()
    df
  }

  /** Unpersist ONE tracked frame and drop it from the registry — the
    * surgical form of [[releaseAll]] for callers sharing a session with
    * other live jobs (a foreachBatch body must not blow away caches
    * that concurrent queries on the same session still read).
    */
  def release(df: DataFrame): Unit = {
    val tracked = registry.get(df.sparkSession)
    if (tracked != null) tracked.remove(df)
    df.unpersist(blocking = false)
  }

  /** Immediately free a DEAD checkpoint's storage blocks (one no plan
    * will read again — e.g. a superseded iteration's label frame). No-op
    * for non-checkpoint frames.
    */
  def releaseCheckpoint(df: DataFrame): Unit =
    checkpointRddOf(df).foreach { rdd =>
      val tracked = rddRegistry.get(df.sparkSession)
      if (tracked != null) tracked.remove(rdd)
      rdd.unpersist(blocking = false)
    }

  /** Unpersist every frame and checkpoint RDD this registry tracked for
    * `spark`. Non-blocking (the block manager frees asynchronously); safe
    * to call when nothing is tracked. Loops until the session has no
    * entry, so a persist() racing in from another thread is still
    * released rather than stranded.
    */
  def releaseAll(spark: SparkSession): Unit = {
    var frames = registry.remove(spark)
    while (frames != null) {
      frames.forEach(df => df.unpersist(blocking = false))
      frames = registry.remove(spark)
    }
    var rdds = rddRegistry.remove(spark)
    while (rdds != null) {
      rdds.forEach(_.unpersist(blocking = false))
      rdds = rddRegistry.remove(spark)
    }
    evictStopped()
  }

  /** Drop registry entries whose session has been stopped — their block
    * stores are gone with the SparkContext, but the strong references
    * here would otherwise pin the session object for the JVM's life.
    */
  private def evictStopped(): Unit = {
    registry.keySet.forEach { s =>
      if (s.sparkContext.isStopped) registry.remove(s)
    }
    rddRegistry.keySet.forEach { s =>
      if (s.sparkContext.isStopped) rddRegistry.remove(s)
    }
  }

  /** Number of frames currently tracked for `spark` (test/diagnostic). */
  def trackedCount(spark: SparkSession): Int = {
    val s = registry.get(spark)
    if (s == null) 0 else s.size()
  }

  /** Number of checkpoint RDDs currently tracked (test/diagnostic). */
  def trackedRddCount(spark: SparkSession): Int = {
    val s = rddRegistry.get(spark)
    if (s == null) 0 else s.size()
  }
}
