package graft.pipeline

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Plan pins for the curated-shard publish path
  * ([[Multimodal.publishKept]] + `writeShards(preShuffled = true)`),
  * the two r15 scale findings:
  *
  *  1. the kept-manifest join carries NO broadcast hint — the manifest
  *     is corpus-sized in the full loop (one row per kept sample), so a
  *     forced broadcast is a driver-memory cliff at 1e8+ samples; with
  *     broadcast disabled (the does-not-fit shape) the plan must be a
  *     plain shuffled key join;
  *  2. at most ONE exchange carries payload bytes — samples assemble
  *     shard-locally in the tar scan, only the join's own shuffle moves
  *     png/wav rows (none at all when AQE broadcasts the manifest), and
  *     the writer reuses the join's partitioning as the shard layout
  *     instead of re-sharding.
  */
class MultimodalPublishPlanSpec extends SparkSpec {
  import spark.implicits._

  /** Walk the physical tree through AQE wrappers and query stages. */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
    case q: QueryStageExec        => q +: flatten(q.plan)
    case o                        => o +: o.children.flatMap(flatten)
  }

  test("publish kept-join: no forced broadcast; one payload exchange") {
    val base = s"target/graft-test/mmplan_${System.nanoTime()}"
    val df = (0L until 6L).toDF("doc_id")
    val png = Multimodal.patternedAssets(spark, df, "doc_id").toDF()
      .select(col("asset_id").as("id"), col("data").as("png"))
    val wav = Multimodal.toneAssets(spark, df, "doc_id").toDF()
      .select(col("asset_id").as("id"), col("data").as("wav"))
    graft.sources.WebDataset.writeShards(
      png.join(wav, "id")
        .select(col("id").cast("string").as("key"), col("png"), col("wav")),
      "key", Seq("png" -> col("png"), "wav" -> col("wav")),
      s"$base/in", shards = 2)
    val manifest = Seq((0L, 0L, 1L), (2L, 2L, 1L), (4L, 4L, 1L))
      .toDF("doc", "cluster", "n_members")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val kept = Multimodal.publishKept(spark, s"$base/in", manifest)
      assert(!kept.queryExecution.analyzed.toString.contains("ResolvedHint"),
        "the full-corpus publish join must not carry a broadcast hint")

      val rows = kept.collect() // finalizes the adaptive plan
      assert(rows.map(_.getString(0)).toSet == Set("0", "2", "4"))
      assert(rows.forall(r => !r.isNullAt(1) && !r.isNullAt(2)),
        "shard-local assembly must deliver both modalities per sample")

      val nodes = flatten(kept.queryExecution.executedPlan)
      assert(!nodes.exists(_.isInstanceOf[BroadcastExchangeExec]),
        s"no mandatory broadcast in the at-scale plan:\n${kept.queryExecution.executedPlan}")
      val payloadShuffles = nodes.collect {
        case s: ShuffleExchangeExec
            if s.output.exists(a => a.name == "png" || a.name == "wav") => s
      }
      assert(payloadShuffles.size == 1,
        s"exactly one exchange may carry payload bytes, found ${payloadShuffles.size}:\n" +
          kept.queryExecution.executedPlan)

      // the writer reuses the join's partitioning as the shard layout:
      // publishing preShuffled adds no re-shard exchange on top, and
      // the read-back is exactly the kept set
      graft.sources.WebDataset.writeShards(kept, "key",
        Seq("png" -> col("png"), "wav" -> col("wav")), s"$base/out",
        shards = 2, preShuffled = true)
      val back = graft.sources.WebDataset
        .read(spark, s"$base/out/shard-*.tar")
        .select("key").distinct().as[String].collect().toSet
      assert(back == Set("0", "2", "4"), s"read-back keys: $back")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      OperatorCache.releaseAll(spark)
    }
  }
}
