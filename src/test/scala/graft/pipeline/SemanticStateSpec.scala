package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Persisted semantic-dedup state contracts: the layout probe equals
  * the in-memory incremental operator, deletes retract suppression,
  * update re-embeds in place, compaction preserves the verdict, and
  * the delete is replay-safe.
  */
class SemanticStateSpec extends SparkSpec {
  import spark.implicits._

  private def vec(g: Int, jitter: Float): Seq[Float] = {
    val v = Array.fill(8)(0f); v(g) = 1f; v(7) = jitter; v.toSeq
  }

  // prior corpus: direction groups 0,1,2 twice each (ids 0-5; i%3 is
  // the group, so group 0 = {0,3}, group 1 = {1,4}, group 2 = {2,5})
  private lazy val prev = (0 until 6).map(i => (i.toLong, vec(i % 3, 0.001f * i)))
    .toDF("vec_id", "embedding")
  private lazy val batch = Seq(
    (10L, vec(0, 0.01f)),                           // near prior group 0
    (11L, vec(1, 0.01f)),                           // near prior group 1
    (12L, Seq(0f, 0f, 0f, 0f, 1f, 0f, 0f, 0f)),     // fresh direction
    (13L, Seq(0f, 0f, 0f, 0f, 1f, 0f, 0f, 0.01f)),  // in-batch dup of 12
  ).toDF("vec_id", "embedding")

  private def survivors(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("vec_id").as[Long].collect().sorted.toSeq

  test("semanticDedupFromState ≡ semanticDedupIncremental; prior side pruned") {
    val dir = s"target/graft-test/semstate_${System.nanoTime()}"
    Similarity.writeDedupState(prev, "vec_id", "embedding", dir,
      threshold = 0.9, k = 2)
    val out = Similarity.semanticDedupFromState(spark, dir, batch)
    assert(survivors(out) == Seq(12L), s"got ${survivors(out)}")
    // the prior scan is partition-pruned to the batch's cells
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
        l.contains("PartitionFilters") && l.contains("centroid#")),
      s"expected centroid partition pruning:\n${plan.take(800)}")
    OperatorCache.releaseAll(spark)
    // agreement with the in-memory operator on the same frozen index
    val index = Similarity.readDedupIndex(spark, dir)
    val priorAssigned = Similarity.ivfIndex(prev, "embedding", index)
    val inMem = Similarity.semanticDedupIncremental(priorAssigned, batch,
      "vec_id", "embedding", index, threshold = 0.9)
    assert(survivors(inMem) == Seq(12L))
    OperatorCache.releaseAll(spark)
  }

  test("lifecycle: delete retracts suppression, update re-embeds, compact holds") {
    val dir = s"target/graft-test/semstate_lc_${System.nanoTime()}"
    Similarity.writeDedupState(prev, "vec_id", "embedding", dir,
      threshold = 0.9, k = 2)
    def probe() = {
      val s = survivors(Similarity.semanticDedupFromState(spark, dir, batch))
      OperatorCache.releaseAll(spark); s
    }
    assert(probe() == Seq(12L))
    // DELETE prior group 1 ({1,4}): 11 is no longer suppressed
    Similarity.deleteFromDedupState(spark, dir,
      Seq(1L, 4L).toDF("vec_id"), "vec_id")
    assert(probe() == Seq(11L, 12L), s"after delete: ${probe()}")
    // replaying the delete appends nothing (idempotent)
    Similarity.deleteFromDedupState(spark, dir,
      Seq(1L, 4L).toDF("vec_id"), "vec_id")
    assert(spark.read.parquet(s"$dir/_tombstones").count() == 2L)
    // UPDATE prior group 0 ({0,3}) to a new direction (re-embed): 10 is
    // released, and a batch vector near the NEW embedding is suppressed
    Similarity.updateDedupState(spark, dir, Seq(
        (0L, vec(5, 0f)), (3L, vec(5, 0.001f)),
      ).toDF("vec_id", "embedding"), "vec_id")
    assert(probe() == Seq(10L, 11L, 12L), s"after update: ${probe()}")
    val batch2 = Seq((20L, vec(5, 0.01f))).toDF("vec_id", "embedding")
    val s2 = survivors(Similarity.semanticDedupFromState(spark, dir, batch2))
    OperatorCache.releaseAll(spark)
    assert(s2 == Seq(), s"batch near the re-embedded vector must drop: $s2")
    // COMPACT: verdicts unchanged, tombstones cleared, dead versions gone
    Similarity.compactDedupState(spark, dir)
    assert(probe() == Seq(10L, 11L, 12L), s"after compact: ${probe()}")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_tombstones")))
    // live rows: prior {2,5} at gen 0 + re-embedded {0,3} at gen 1
    assert(spark.read.parquet(s"$dir/assigned").count() == 4L)
    assert(spark.read.parquet(s"$dir/ids").count() == 4L)
  }
}
