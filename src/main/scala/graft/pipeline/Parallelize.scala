package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._

/** Partition-width guard for CPU-heavy per-row pipeline stages (text
  * scoring, tokenization, fingerprinting).
  *
  * A scan's parallelism is its split count: a corpus that arrives as one
  * small file (or few row groups) plans as ONE task, so an expensive
  * projection over it runs on one core while the rest of the cluster
  * idles — measured 2.4s single-threaded vs 0.3s wide for the p15 quality
  * scan at sf0.1. At real scale the scan is already wider than the
  * cluster and this is a no-op; the repartition only fires for inputs
  * small enough that shuffling them is trivial by construction.
  */
private[graft] object Parallelize {

  /** Repartition `df` to cluster width if (and only if) it is a
    * shuffle-free plan (scan/project/filter/generate) with fewer
    * partitions than `defaultParallelism`.
    *
    * The partition probe (`df.rdd`) executes nothing for shuffle-free
    * plans, but under AQE it WOULD run every upstream exchange of a
    * shuffled plan just to answer the question — so plans containing
    * shuffle-inducing operators are returned untouched (Spark already
    * picked cluster-width partitioning for them), and streaming plans
    * cannot be probed or repartitioned this way at all.
    *
    * The widened frame is PERSISTED (MEMORY_AND_DISK, tracked by
    * [[OperatorCache]] under the usual release contract), not just
    * repartitioned: filters and projections push straight through a bare
    * `Repartition`, so the caller's expensive expressions land back on
    * the narrow map side of the exchange — measured on the p15 quality
    * filter, whose scoring ran single-threaded UNDER the fan-out shuffle
    * (twice: once for the pushed filter, once for the projection). The
    * cache is an optimizer barrier; it only ever holds an input small
    * enough to have arrived narrower than the cluster.
    */
  def ensureWide(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    // WHITELIST of known-narrow operators, not a blocklist of shufflers:
    // the earlier inverted form enumerated shuffle-inducers and silently
    // missed MapGroups/CoGroup/FlatMapGroupsWithState (and any operator a
    // future Spark adds) — probing those under AQE executes their whole
    // upstream exchange. A plan with ANY unrecognized node is returned
    // untouched; the probe only ever runs on scan/project/filter shapes.
    val narrowOnly = !df.queryExecution.optimizedPlan.exists {
      case _: LeafNode | _: Project | _: Filter | _: Generate | _: Union |
          _: Sample | _: LocalLimit | _: TypedFilter | _: SubqueryAlias |
          _: SerializeFromObject | _: DeserializeToObject => false
      case _ => true
    }
    if (!narrowOnly) df
    else {
      val target = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < target)
        OperatorCache.persist(df.repartition(target))
      else df
    }
  }
}
