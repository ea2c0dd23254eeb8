package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.{Multimodal, OperatorCache}
import graft.sources.WebDataset

/** The streaming multimodal gate must equal the one-shot curate over
  * the same samples — across micro-batch boundaries, where the rolling
  * fingerprint state (not the initial corpus) catches cross-batch
  * duplicates. Fixture geometry as in MultimodalCurateSpec: duplicate
  * classes = id mod 18.
  */
class StreamingMultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def writeShardsTo(ids: Seq[Long], watchDir: String, prefix: String): Unit = {
    val df = ids.toDF("doc_id")
    val png = Multimodal.patternedAssets(spark, df, "doc_id")
      .collect().map(a => a.asset_id -> a.data).toMap
    val wav = Multimodal.toneAssets(spark, df, "doc_id")
      .collect().map(a => a.asset_id -> a.data).toMap
    val tmp = s"$watchDir-staging-$prefix"
    WebDataset.writeShards(
      ids.map(i => (i.toString, png(i), wav(i))).toDF("key", "png", "wav"),
      "key", Seq("png" -> col("png"), "wav" -> col("wav")), tmp, shards = 2)
    new java.io.File(watchDir).mkdirs()
    Option(new java.io.File(tmp).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".tar"))
      .foreach { f =>
        java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(watchDir, s"$prefix-${f.getName}"))
      }
  }

  test("streamed multimodal gate ≡ one-shot curate across batch boundaries") {
    val base = s"target/graft-test/mmstream_${System.nanoTime()}"
    val watch = s"$base/watch"
    // prior corpus: classes 0..12 seen
    writeShardsTo(0L until 13L, s"$base/prior", "prior")
    Multimodal.writeMmState(spark, s"$base/prior", s"$base/state")

    new java.io.File(watch).mkdirs()
    val kept = ArrayBuffer.empty[Long]
    val q = StreamingMultimodal.ingestGate(
      WebDataset.readStream(spark, watch),
      spark.read.parquet(s"$base/state/fp").select("doc", "fp"),
      spark.read.parquet(s"$base/state/peaks")
        .select("doc", "frame", "peak_bin")) { (batch, _) =>
      kept ++= batch.select(col("key").cast("long")).as[Long].collect()
    }.start()
    try {
      // batch 1: classes 13..17 fresh (kept), 18..20 ≡ 0..2 (seen → dropped)
      writeShardsTo(13L to 20L, watch, "b1")
      q.processAllAvailable()
      assert(kept.sorted.toSeq == (13L to 17L),
        s"batch 1: fresh classes survive, re-crawls drop — got ${kept.sorted}")
      // batch 2: ids 31..35 ≡ classes 13..17 — CROSS-BATCH dups of
      // batch 1's keeps; only the rolling state can catch them
      writeShardsTo(31L to 35L, watch, "b2")
      q.processAllAvailable()
    } finally q.stop()
    assert(kept.sorted.toSeq == (13L to 17L),
      s"cross-batch dups must drop against the ROLLING state: ${kept.sorted}")

    // ground truth: the one-shot loop over prior ∪ both batches,
    // restricted to the streamed ids
    writeShardsTo((0L until 13L) ++ (13L to 20L) ++ (31L to 35L),
      s"$base/all", "all")
    val full = Multimodal.curateShards(spark, s"$base/all", s"$base/allout")
      .where(col("doc") >= 13).select("doc").as[Long].collect().sorted.toSeq
    OperatorCache.releaseAll(spark)
    assert(full == kept.sorted.toSeq,
      s"stream gate must equal the one-shot loop: full=$full streamed=${kept.sorted}")
  }
}
