package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The composed recrawl advance: one batch of (changed, deleted,
  * re-embedded) deltas applied through Recrawl.advance must leave every
  * registered layout serving exactly what per-layout rebuilds on the
  * final corpus would — and compaction must not change any verdict.
  */
class RecrawlSpec extends SparkSpec {
  import spark.implicits._

  private def phrase(tag: String) =
    s"alpha beta gamma delta $tag epsilon zeta eta theta iota kappa " +
      s"lambda mu nu xi omicron $tag pi rho sigma"

  private def vec(g: Int, jitter: Float): Seq[Float] = {
    val v = Array.fill(8)(0f); v(g) = 1f; v(7) = jitter; v.toSeq
  }

  test("advance + compact ≡ per-layout rebuilds on the final corpus") {
    val base = s"target/graft-test/recrawl_${System.nanoTime()}"
    val v1 = Seq(
      (1L, phrase("one")),
      (2L, phrase("two")),
      (3L, "vector join filter query engine words " + phrase("three")),
      (4L, "entirely unrelated content with no benchmark overlap at all " +
        "just plain filler prose for the corpus fixture"),
    ).toDF("doc_id", "text")
    val vecs1 = Seq(
      (1L, vec(0, 0f)), (2L, vec(1, 0f)), (3L, vec(2, 0f)), (4L, vec(3, 0f)),
    ).toDF("doc_id", "embedding")
    val block = Seq((100L, phrase("one"))).toDF("doc_id", "text")

    val coarse = Similarity.ivfTrain(vecs1, "doc_id", "embedding", k = 2)
    val books = Similarity.trainPq(vecs1, "doc_id", "embedding", m = 2, k = 4)
    val layouts = Recrawl.ServingLayouts(
      textIndex = Some(s"$base/bm25"),
      shingleIndex = Some(s"$base/shingles"),
      dedupState = Some(s"$base/semstate"),
      annIndex = Some(Recrawl.AnnIvfPq(s"$base/ann", "embedding", coarse, books, "doc_id")))
    TextSearch.writeIndex(v1, "doc_id", "text", s"$base/bm25")
    Dedup.writeShingleIndex(v1, "doc_id", "text", s"$base/shingles",
      shingleK = 5, buckets = 16)
    Similarity.writeDedupState(vecs1, "doc_id", "embedding", s"$base/semstate",
      threshold = 0.9, k = 2)
    Similarity.writeIvfPq(vecs1, "embedding", s"$base/ann", coarse, books)
    OperatorCache.releaseAll(spark)

    // the recrawl delta: doc 2 changed (now contaminated + re-embedded
    // to a new direction), doc 10 is new, doc 3 disappeared
    val changed = Seq(
      (2L, phrase("one") + " vector join filter"),
      (10L, "fresh page about stream window aggregation " + phrase("ten")),
    ).toDF("doc_id", "text")
    val changedVecs = Seq(
      (2L, vec(5, 0f)), (10L, vec(6, 0f)),
    ).toDF("doc_id", "embedding")
    Recrawl.advance(spark, changed, Seq(3L).toDF("doc_id"),
      "doc_id", "text", layouts, Some(changedVecs))
    OperatorCache.releaseAll(spark)

    val finalCorpus = Seq(
      (1L, phrase("one")),
      (2L, phrase("one") + " vector join filter"),
      (4L, "entirely unrelated content with no benchmark overlap at all " +
        "just plain filler prose for the corpus fixture"),
      (10L, "fresh page about stream window aggregation " + phrase("ten")),
    ).toDF("doc_id", "text")

    def bm25() = TextSearch.searchTopK(spark, s"$base/bm25",
        Seq("vector", "join", "filter"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    def decon() = Dedup.probeContamination(spark, s"$base/shingles",
        block, "doc_id", "text", minOverlap = 3)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq

    // rebuild ground truths on the final corpus
    val rbBm = s"$base/bm25_rb"; val rbSh = s"$base/shingles_rb"
    TextSearch.writeIndex(finalCorpus, "doc_id", "text", rbBm)
    Dedup.writeShingleIndex(finalCorpus, "doc_id", "text", rbSh,
      shingleK = 5, buckets = 16)
    OperatorCache.releaseAll(spark)
    val bmTruth = TextSearch.searchTopK(spark, rbBm,
        Seq("vector", "join", "filter"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    val deconTruth = Dedup.probeContamination(spark, rbSh,
        block, "doc_id", "text", minOverlap = 3)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq

    assert(bm25() == bmTruth, s"bm25 ${bm25()} vs rebuild $bmTruth")
    // deleted doc 3 must be gone from the served ranking entirely
    assert(!bm25().exists(_._1 == 3L))
    // doc 10's phrase("ten") shares the non-tag shingle runs with the
    // blocklist, so the new doc is flagged too — as in the rebuild
    assert(decon() == deconTruth && decon().map(_._1).toSet == Set(1L, 2L, 10L),
      s"decon ${decon()} vs rebuild $deconTruth")

    // semantic state: deleted doc 3's direction no longer suppresses,
    // doc 2's OLD direction no longer suppresses, its NEW one does
    def survivors(b: org.apache.spark.sql.DataFrame) = {
      val s = Similarity.semanticDedupFromState(spark, s"$base/semstate", b)
        .select("doc_id").as[Long].collect().sorted.toSeq
      OperatorCache.releaseAll(spark); s
    }
    val probeBatch = Seq(
      (20L, vec(2, 0.01f)), // near deleted doc 3 → survives
      (21L, vec(1, 0.01f)), // near doc 2's OLD embedding → survives
      (22L, vec(5, 0.01f)), // near doc 2's NEW embedding → dropped
      (23L, vec(6, 0.01f)), // near new doc 10 → dropped
    ).toDF("doc_id", "embedding")
    assert(survivors(probeBatch) == Seq(20L, 21L),
      s"semantic survivors ${survivors(probeBatch)}")

    // ANN serving advanced in the same call: deleted doc 3 is gone,
    // doc 2 serves its NEW embedding (exact match on the probe), the
    // new doc 10 serves too
    def ann(query: Seq[Float]) = {
      val r = Similarity.probeIvfPq(spark, s"$base/ann", "doc_id",
          "embedding", coarse, books, query, k = 6, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      OperatorCache.releaseAll(spark); r
    }
    assert(!ann(vec(2, 0f)).exists(_._1 == 3L), "deleted doc 3 still serves")
    assert(ann(vec(5, 0f)).headOption.exists(t => t._1 == 2L && t._2 == 1.0),
      s"doc 2's re-embedding must rank first: ${ann(vec(5, 0f))}")
    assert(ann(vec(6, 0f)).headOption.exists(t => t._1 == 10L && t._2 == 1.0),
      s"new doc 10 must serve: ${ann(vec(6, 0f))}")

    // compaction changes no verdict anywhere
    Recrawl.compact(spark, layouts)
    assert(bm25() == bmTruth && decon() == deconTruth &&
      survivors(probeBatch) == Seq(20L, 21L) &&
      ann(vec(5, 0f)).headOption.exists(t => t._1 == 2L && t._2 == 1.0),
      "verdict drifted after compact")
    // and every layout's tombstone set is cleared
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (d <- Seq("bm25", "shingles", "semstate", "ann"))
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$base/$d/_tombstones")),
        s"$d tombstones not cleared")
  }

  test("Recrawl.build bootstraps all four layouts probe-ready in one call") {
    val base = s"target/graft-test/recrawl_build_${System.nanoTime()}"
    val corpus = Seq(
      (1L, "vector join filter engine " + phrase("one")),
      (2L, phrase("two")),
    ).toDF("doc_id", "text")
    val vecs = Seq((1L, vec(0, 0f)), (2L, vec(1, 0f)))
      .toDF("doc_id", "embedding")
    val coarse = Similarity.ivfTrain(vecs, "doc_id", "embedding", k = 2)
    val books = Similarity.trainPq(vecs, "doc_id", "embedding", m = 2, k = 4)
    val layouts = Recrawl.ServingLayouts(
      textIndex = Some(s"$base/bm25"),
      shingleIndex = Some(s"$base/shingles"),
      dedupState = Some(s"$base/semstate"),
      annIndex = Some(Recrawl.AnnIvfPq(s"$base/ann", "embedding", coarse, books, "doc_id")))
    Recrawl.build(spark, corpus, "doc_id", "text", layouts,
      vectors = Some(vecs), dedupThreshold = 0.9, dedupK = 2)
    OperatorCache.releaseAll(spark)

    val ranked = TextSearch.searchTopK(spark, s"$base/bm25",
      Seq("vector", "join"), k = 5).collect().map(_.getLong(0)).toSeq
    assert(ranked == Seq(1L), s"bm25 from build: $ranked")
    val block = Seq((100L, phrase("two"))).toDF("doc_id", "text")
    // both docs share the blocklist phrase's non-tag 8-shingle runs
    val flagged = Dedup.probeContamination(spark, s"$base/shingles", block,
      "doc_id", "text", minOverlap = 3).select("doc").as[Long].collect().sorted.toSeq
    assert(flagged == Seq(1L, 2L), s"decon from build: $flagged")
    val surv = Similarity.semanticDedupFromState(spark, s"$base/semstate",
        Seq((10L, vec(0, 0.01f)), (11L, vec(5, 0f))).toDF("doc_id", "embedding"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    OperatorCache.releaseAll(spark)
    assert(surv == Seq(11L), s"dedup state from build: $surv")
    val top = Similarity.probeIvfPq(spark, s"$base/ann", "doc_id", "embedding",
      coarse, books, vec(1, 0f), k = 1, nprobe = 2).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(top == Seq((2L, 1.0)), s"ann from build: $top")
    OperatorCache.releaseAll(spark)
  }

  test("advance awaits every layout task: a failing layout does not " +
      "abandon siblings mid-write (r18 ADVICE)") {
    val base = s"target/graft-test/recrawl_fail_${System.nanoTime()}"
    val v1 = Seq((1L, phrase("one")), (2L, phrase("two"))).toDF("doc_id", "text")
    // the shingle layout exists; the text layout path does NOT, so its
    // task throws while the shingle task is advancing concurrently
    Dedup.writeShingleIndex(v1, "doc_id", "text", s"$base/shingles",
      shingleK = 5, buckets = 16)
    OperatorCache.releaseAll(spark)
    val layouts = Recrawl.ServingLayouts(
      textIndex = Some(s"$base/bm25_missing"),
      shingleIndex = Some(s"$base/shingles"))
    val changed = Seq((3L, phrase("three"))).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Recrawl.advance(spark, changed, Seq(2L).toDF("doc_id"),
        "doc_id", "text", layouts)
    }
    OperatorCache.releaseAll(spark)
    assert(e != null)
    // the sibling layout must have COMPLETED its delete+update despite
    // the co-scheduled failure — advance returns only when every task
    // has finished, so no straggler writes after the call
    val block = Seq((100L, phrase("three")), (101L, phrase("two")))
      .toDF("doc_id", "text")
    val flagged = Dedup.probeContamination(spark, s"$base/shingles", block,
      "doc_id", "text", minOverlap = 3)
      .select("doc").as[Long].collect().sorted.toSeq
    OperatorCache.releaseAll(spark)
    assert(flagged.contains(3L) && !flagged.contains(2L),
      s"shingle layout must hold the full advance (new doc in, deleted " +
        s"doc out) even when a sibling layout task failed: $flagged")
  }
}
