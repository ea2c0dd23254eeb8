package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.WebDataset

/** The composed multimodal curation loop ([[Multimodal.curateShards]]):
  * tar shards in → decode both modalities → duplicate only when image
  * AND audio agree → canonical per component → curated tar shards out.
  *
  * Fixture geometry: image class = id % 9, audio class = id % 6, so a
  * pair is a multimodal duplicate iff ids agree mod 18 (lcm). With ids
  * 0..35 every doc i pairs with exactly i±18 — and the ids 9 apart
  * (image-dup, audio-distinct) pin the conservative intersection.
  */
class MultimodalCurateSpec extends SparkSpec {
  import spark.implicits._

  test("curate loop: intersection dedup, canonical keep, payloads intact") {
    val base = s"target/graft-test/mmcurate_${System.nanoTime()}"
    val ids = (0L until 36L).toDF("doc_id")
    val png = Multimodal.patternedAssets(spark, ids, "doc_id")
      .collect().map(a => a.asset_id -> a.data).toMap
    val wav = Multimodal.toneAssets(spark, ids, "doc_id")
      .collect().map(a => a.asset_id -> a.data).toMap
    // id 100: image class 1 (same as docs 1 and 19) but NO audio part —
    // absent evidence must never drop a sample
    val orphanPng = Multimodal.patternedAssets(
      spark, Seq(100L).toDF("doc_id"), "doc_id").collect().head.data
    val input = ((0L until 36L).map(i =>
      (i.toString, png(i), wav(i))) :+ (("100", orphanPng, null)))
      .toDF("key", "png", "wav")
    WebDataset.writeShards(input, "key",
      Seq("png" -> col("png"), "wav" -> col("wav")), s"$base/in", shards = 2)

    val out = Multimodal.curateShards(spark, s"$base/in", s"$base/out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    OperatorCache.releaseAll(spark)

    // clusters are exactly {i, i+18} (both modalities agree) plus the
    // singleton 100; i and i+9 (image-only dup) never merge
    val expected = (0L until 18L).map(i => (i, i, 2L, 2L)) :+ ((100L, 100L, 1L, 1L))
    assert(out.toSeq == expected, s"got ${out.toSeq}")

    // the curated tar really carries the payloads, byte-identical
    val outParts = WebDataset.read(spark, s"$base/out/shard-*.tar")
      .select("key", "ext", "payload")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Array[Byte]](2))
      .toMap
    assert(java.util.Arrays.equals(outParts(("7", "png")), png(7L)))
    assert(java.util.Arrays.equals(outParts(("7", "wav")), wav(7L)))
    assert(java.util.Arrays.equals(outParts(("100", "png")), orphanPng))
    assert(!outParts.contains(("100", "wav")), "no wav part was ever written for 100")
    assert(!outParts.keySet.exists(_._1 == "25"), "dropped docs must not be re-published")

    // the manifest parquet matches what the returned frame reported
    val mf = spark.read.parquet(s"$base/out/_manifest")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(mf.toSeq == expected.map(e => (e._1, e._2, e._3)))
  }

  private def writeFixtureShards(ids: Seq[Long], dir: String): Unit = {
    val df = ids.toDF("doc_id")
    val png = Multimodal.patternedAssets(spark, df, "doc_id")
      .collect().map(a => a.asset_id -> a.data).toMap
    val wav = Multimodal.toneAssets(spark, df, "doc_id")
      .collect().map(a => a.asset_id -> a.data).toMap
    WebDataset.writeShards(
      ids.map(i => (i.toString, png(i), wav(i))).toDF("key", "png", "wav"),
      "key", Seq("png" -> col("png"), "wav" -> col("wav")), dir, shards = 2)
  }

  test("incremental ≡ full on the batch; state append chains recrawls") {
    val base = s"target/graft-test/mmcurate_inc_${System.nanoTime()}"
    // prior covers classes 0..12 (mod 18); batch 13..35 brings classes
    // 13..17 fresh twice over and re-crawls 0..12 once
    writeFixtureShards(0L until 13L, s"$base/prior")
    writeFixtureShards(13L until 36L, s"$base/batch1")
    Multimodal.writeMmState(spark, s"$base/prior", s"$base/state")

    val inc = Multimodal.curateShardsIncremental(
      spark, s"$base/state", s"$base/batch1", s"$base/out1")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    OperatorCache.releaseAll(spark)
    assert(inc == (13L until 18L).map(i => (i, i, 2L, 2L)),
      s"fresh classes 13..17 survive as {i, i+18} clusters, got $inc")

    // the ≡ proof on crafted data: full run over prior ∪ batch,
    // restricted to batch ids, must agree exactly
    writeFixtureShards(0L until 36L, s"$base/all")
    val full = Multimodal.curateShards(spark, s"$base/all", s"$base/allout")
      .where(col("doc") >= 13).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    OperatorCache.releaseAll(spark)
    assert(full == inc, s"full-restricted $full vs incremental $inc")

    // replay of a batch WITH kept samples (r16 ADVICE): the prior-state
    // read must exclude the batch's own partition — if the earlier
    // run's fingerprints read back as "prior", every sample self-matches
    // (hamming 0, all audio frames), the rerun marks the whole batch
    // contaminated, and publishes an empty manifest over the
    // previously-good shards
    val fpOnce = spark.read.parquet(s"$base/state/fp").count()
    val replay = Multimodal.curateShardsIncremental(
      spark, s"$base/state", s"$base/batch1", s"$base/out1")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    OperatorCache.releaseAll(spark)
    assert(replay == inc,
      s"replay must reproduce the original keep set $inc, got $replay")
    assert(spark.read.parquet(s"$base/state/fp").count() == fpOnce,
      "replay overwrites its own state partition, never appends")
    // the re-published shards still carry the kept samples' payloads
    val replayKeys = WebDataset.read(spark, s"$base/out1/shard-*.tar")
      .select("key").distinct().collect().map(_.getString(0)).toSet
    assert(replayKeys == (13L until 18L).map(_.toString).toSet,
      s"kept payloads survive the rerun, got $replayKeys")

    // chaining: batch 1's fingerprints appended, so a second batch
    // re-crawling ANY class 0..17 is now fully contaminated
    assert(spark.read.parquet(s"$base/state/fp").count() == 13 + 23)
    writeFixtureShards(36L until 54L, s"$base/batch2")
    val inc2 = Multimodal.curateShardsIncremental(
      spark, s"$base/state", s"$base/batch2", s"$base/out2")
    assert(inc2.isEmpty, "every class was seen by now — nothing survives")
    OperatorCache.releaseAll(spark)

    // idempotent advance: replaying a batch dir (partial-failure rerun)
    // must OVERWRITE its own batch= state partition, not append
    // duplicate fingerprint/landmark rows (duplicates would multiply
    // the audio join counts and falsely contaminate future batches)
    val fpAfter = spark.read.parquet(s"$base/state/fp").count()
    val pkAfter = spark.read.parquet(s"$base/state/peaks").count()
    Multimodal.curateShardsIncremental(
      spark, s"$base/state", s"$base/batch2", s"$base/out2_replay")
    OperatorCache.releaseAll(spark)
    assert(spark.read.parquet(s"$base/state/fp").count() == fpAfter,
      "batch replay must not duplicate fp state rows")
    assert(spark.read.parquet(s"$base/state/peaks").count() == pkAfter,
      "batch replay must not duplicate landmark state rows")
  }
}
