package graft.streaming

import java.nio.file.{Files, Paths}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.TrainingPipeline
import graft.sources.Warc

/** Live-crawl ingest: WARC shards arriving in a watched directory
  * stream through parse → curation gate, and the result must equal the
  * batch curate over the same documents — the fetch→screen-at-the-door
  * pipeline, end to end.
  */
class WarcIngestSpec extends SparkSpec {
  import spark.implicits._

  private def sentence(tag: String) =
    s"the $tag morning report describes how the valley weather shifted " +
      s"over seven quiet days while local farmers watched the $tag clouds drift"

  /** Write docs as one WARC shard, then move it into the watched dir
    * (atomic arrival — the file-source contract). */
  private def arrive(watched: String, tag: String, docs: Seq[(Long, String)]): Unit = {
    val scratch = s"target/graft-test/warc_in_$tag"
    Warc.writeShards(docs.toDF("doc_id", "text"), "doc_id", "text",
      scratch, shards = 1)
    val f = new java.io.File(scratch).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).head
    Files.move(f.toPath, Paths.get(watched, s"$tag.warc.gz"))
  }

  test("streamed WARC shards gate-curate ≡ batch curate over the same docs") {
    val watched = s"target/graft-test/warc_watch_${System.nanoTime()}"
    Files.createDirectories(Paths.get(watched))

    val prev = Seq(1L -> sentence("alpha"), 2L -> sentence("bravo"))
      .toDF("doc_id", "text")
    val state = TrainingPipeline.curateState(prev, "doc_id", "text",
      minQuality = 0.3, minWords = 5, dedupThreshold = 0.7)

    val shard1 = Seq(
      10L -> (sentence("alpha") + " again"), // near-dup of the corpus → dropped
      11L -> sentence("charlie"),            // fresh → survives
      13L -> "!!! ??? !!! ??? !!!",          // quality floor
    )
    val shard2 = Seq(
      20L -> (sentence("charlie") + " more"), // cross-SHARD dup → dropped
      23L -> sentence("delta"),               // fresh → survives
    )

    val parsed = Warc.readStream(spark, watched)
      .where(col("warc_type") === "response")
      .select(
        regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
          .cast("long").as("doc_id"),
        decode(col("payload"), "UTF-8").as("text"))
    val streamed = ArrayBuffer.empty[(Long, String)]
    val q = StreamingCurate.curateGate(parsed, state) { (curated, _) =>
      streamed ++= curated.collect().map(r => (r.getLong(0), r.getString(1)))
    }.start()
    try {
      arrive(watched, "shard1", shard1)
      q.processAllAvailable()
      assert(streamed.map(_._1).sorted.toSeq == Seq(11L),
        s"shard 1 gate: ${streamed.map(_._1)}")
      arrive(watched, "shard2", shard2)
      q.processAllAvailable()
    } finally q.stop()

    assert(streamed.map(_._1).sorted.toSeq == Seq(11L, 23L),
      s"gated ids: ${streamed.map(_._1)}")
    // texts survive the WARC round trip byte-exactly into the gate
    assert(streamed.toMap.apply(11L) == sentence("charlie"))

    // ground truth: batch curate over everything, restricted to streamed ids
    val full = TrainingPipeline.curate(
      prev.union((shard1 ++ shard2).toDF("doc_id", "text")),
      "doc_id", "text", minQuality = 0.3, minWords = 5,
      dedupThreshold = 0.7, spanK = 0)
      .where(col("doc_id") >= 10L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(full == Seq(11L, 23L), s"batch ground truth diverged: $full")
    graft.pipeline.OperatorCache.releaseAll(spark)
  }
}
