package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.Dedup

/** The streaming dedup gate must flag exactly the batch docs whose
  * verified Jaccard against the indexed corpus clears the threshold —
  * the same answer the batch-side incremental machinery gives on the
  * same data — across multiple micro-batches, without re-hashing the
  * corpus or leaking batch-side caches.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "completely unrelated content about spark physical plans and shuffles"),
    (3L, "a third document that talks about minhash signatures and banding"),
  ).toDF("doc_id", "text")

  // doc 101 near-dups corpus doc 1; 102 near-dups 3; 103 is clean
  private val incoming = Seq(
    (101L, "the quick brown fox jumps over the lazy dog near the river"),
    (102L, "a third document that talks about minhash signatures and bands"),
    (103L, "nothing like anything indexed so far in this tiny corpus"),
  )

  test("gate flags exactly the batch docs the batch-side oracle flags") {
    val index = Dedup.bandIndex(corpus, "doc_id", "text",
      shingleK = 2, numHashes = 16, bands = 8).persist()
    val corpusSets = Dedup.shingleSets(corpus, "doc_id", "text", 2).persist()
    index.count(); corpusSets.count()

    // batch oracle on the same data
    val batchDf = incoming.toDF("doc_id", "text")
    val oracle = StreamingDedup.flagBatch(index, corpusSets, batchDf,
      "doc_id", "text", threshold = 0.5, shingleK = 2, numHashes = 16, bands = 8)
      .select("doc_b").distinct().as[Long].collect().toSet
    assert(oracle == Set(101L, 102L), s"oracle fixture drifted: $oracle")

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")

    val flagged = scala.collection.mutable.Map.empty[Long, Boolean]
    var batches = 0
    val writer = StreamingDedup.dedupGate(docs, index, corpusSets,
      threshold = 0.5, shingleK = 2, numHashes = 16, bands = 8) { (out, _) =>
      batches += 1
      out.select(col("doc_id"), col("is_dup")).collect()
        .foreach(r => flagged(r.getLong(0)) = r.getBoolean(1))
    }

    // two micro-batches: the near-dups, then the clean doc
    mem.addData(incoming(0), incoming(1))
    val q = writer.option("checkpointLocation",
      java.nio.file.Files.createTempDirectory("dedup-gate").toString).start()
    try {
      q.processAllAvailable()
      mem.addData(incoming(2))
      q.processAllAvailable()
    } finally q.stop()

    assert(batches >= 2, "expected at least two micro-batches")
    assert(flagged == Map(101L -> true, 102L -> true, 103L -> false))

    // the long-lived corpus caches must survive the per-batch release
    assert(index.storageLevel.useMemory, "index cache was dropped by the gate")
    assert(corpusSets.storageLevel.useMemory, "corpus sets cache was dropped")
    index.unpersist(); corpusSets.unpersist()
  }

  test("flagBatch equals the non-incremental pair set restricted to corpus×batch") {
    val index = Dedup.bandIndex(corpus, "doc_id", "text",
      shingleK = 2, numHashes = 16, bands = 8)
    val corpusSets = Dedup.shingleSets(corpus, "doc_id", "text", 2)
    val batchDf = incoming.toDF("doc_id", "text")

    val incrementalPairs = StreamingDedup.flagBatch(index, corpusSets, batchDf,
      "doc_id", "text", threshold = 0.5, shingleK = 2, numHashes = 16, bands = 8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet

    // full-corpus near-dups over corpus ∪ batch, restricted to cross pairs
    val all = Dedup.minhashNearDups(corpus.union(batchDf), "doc_id", "text",
      threshold = 0.5, shingleK = 2, numHashes = 16, bands = 8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      .filter(p => p._1 <= 3 && p._2 >= 100)
    graft.pipeline.OperatorCache.releaseAll(spark)

    assert(incrementalPairs == all,
      s"incremental $incrementalPairs vs full $all")
  }
}
