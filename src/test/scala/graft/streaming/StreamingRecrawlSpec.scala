package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.{Dedup, OperatorCache, Recrawl, TextSearch}

/** The streaming maintenance loop must leave the serving layouts
  * exactly where per-layout rebuilds on the corpus-as-of-each-batch
  * would — across micro-batch boundaries, where a later batch deletes
  * what an earlier one upserted.
  */
class StreamingRecrawlSpec extends SparkSpec {
  import spark.implicits._

  private def phrase(tag: String) =
    s"alpha beta gamma delta $tag epsilon zeta eta theta iota kappa " +
      s"lambda mu nu xi omicron $tag pi rho sigma"

  test("streamed deltas ≡ rebuilds on the corpus as of each batch") {
    val base = s"target/graft-test/srecrawl_${System.nanoTime()}"
    val v1 = Seq(
      (1L, phrase("one")),
      (2L, "vector join filter engine page " + phrase("two")),
      (3L, phrase("three")),
    ).toDF("doc_id", "text")
    val block = Seq((100L, phrase("one"))).toDF("doc_id", "text")
    val layouts = Recrawl.ServingLayouts(
      textIndex = Some(s"$base/bm25"),
      shingleIndex = Some(s"$base/shingles"))
    TextSearch.writeIndex(v1, "doc_id", "text", s"$base/bm25")
    Dedup.writeShingleIndex(v1, "doc_id", "text", s"$base/shingles",
      shingleK = 5, buckets = 16)
    OperatorCache.releaseAll(spark)

    def served(bm: String, sh: String) = {
      val ranked = TextSearch.searchTopK(spark, bm,
          Seq("vector", "join", "filter"), k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val flagged = Dedup.probeContamination(spark, sh, block,
          "doc_id", "text", minOverlap = 3)
        .select("doc").as[Long].collect().sorted.toSeq
      OperatorCache.releaseAll(spark)
      (ranked, flagged)
    }
    def rebuilt(corpus: org.apache.spark.sql.DataFrame, tag: String) = {
      TextSearch.writeIndex(corpus, "doc_id", "text", s"$base/bm25_$tag")
      Dedup.writeShingleIndex(corpus, "doc_id", "text", s"$base/shingles_$tag",
        shingleK = 5, buckets = 16)
      OperatorCache.releaseAll(spark)
      served(s"$base/bm25_$tag", s"$base/shingles_$tag")
    }

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val q = StreamingRecrawl.maintainGate(
      mem.toDF().toDF("doc_id", "text", "op"),
      "doc_id", "text", "op", layouts).start()
    try {
      // batch 1: doc 2 re-crawled (loses its query terms, gains
      // contamination), doc 10 new, doc 3 deleted
      mem.addData(
        (2L, phrase("one") + " rewritten page", "upsert"),
        (10L, "fresh vector join filter page " + phrase("ten"), "upsert"),
        (3L, "", "delete"))
      q.processAllAvailable()
      val corpus1 = Seq(
        (1L, phrase("one")),
        (2L, phrase("one") + " rewritten page"),
        (10L, "fresh vector join filter page " + phrase("ten")),
      ).toDF("doc_id", "text")
      assert(served(s"$base/bm25", s"$base/shingles") == rebuilt(corpus1, "b1"),
        "batch 1: streamed layouts drifted from the rebuild")

      // batch 2: batch 1's new doc is deleted again, doc 1 re-crawled
      mem.addData(
        (10L, "", "delete"),
        (1L, "plain rewritten page with nothing shared anymore", "upsert"))
      q.processAllAvailable()
      val corpus2 = Seq(
        (1L, "plain rewritten page with nothing shared anymore"),
        (2L, phrase("one") + " rewritten page"),
      ).toDF("doc_id", "text")
      assert(served(s"$base/bm25", s"$base/shingles") == rebuilt(corpus2, "b2"),
        "batch 2: streamed layouts drifted from the rebuild")
    } finally q.stop()

    // compaction after the stream stops: verdicts unchanged
    val before = served(s"$base/bm25", s"$base/shingles")
    Recrawl.compact(spark, layouts)
    assert(served(s"$base/bm25", s"$base/shingles") == before)
  }
}
