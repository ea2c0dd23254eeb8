package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Degenerate-input contracts: every pipeline operator must return an
  * empty (or correctly trivial) result on an empty corpus — not throw
  * from some intermediate aggregate. Upstream filters routinely produce
  * empty frames (a too-strict quality floor, an off-hours stream
  * window); an operator that crashes on them takes the whole job down.
  */
class EmptyInputSpec extends SparkSpec {
  import spark.implicits._

  private def emptyDocs =
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  private def emptyVecs =
    Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")

  test("dedup family returns empty on an empty corpus") {
    assert(Dedup.exact(emptyDocs, Seq("text"), "doc_id").count() == 0)
    assert(Dedup.minhashNearDups(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.simhashNearDups(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.dedupNearDuplicates(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.nearDupClusters(Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"))
      .count() == 0)
    assert(Dedup.removeSharedSpans(emptyDocs, "doc_id", "text").count() == 0)
    OperatorCache.releaseAll(spark)
  }

  test("text analysis returns empty on an empty corpus") {
    assert(TextAnalysis.analyze(emptyDocs, "text").count() == 0)
    assert(TextAnalysis.cleanCorpus(emptyDocs, "doc_id", "text").count() == 0)
    assert(TextAnalysis.tfidfTopTerms(emptyDocs, "doc_id", "text").count() == 0)
    assert(TextAnalysis.unigramNll(emptyDocs, "doc_id", "text").count() == 0)
    assert(TextAnalysis.bigramNll(emptyDocs, "doc_id", "text").count() == 0)
    OperatorCache.releaseAll(spark)
  }

  test("curation returns empty on an empty corpus") {
    assert(Curation.deterministicSample(emptyDocs, "doc_id", 0.5).count() == 0)
    assert(Curation.packSequences(
      Seq.empty[(Long, Long)].toDF("id", "toks"), "id", "toks", 256L).count() == 0)
    assert(Curation.chunkDocuments(emptyDocs, "doc_id", "text", 16).count() == 0)
    // token-less docs yield no chunks rather than a single empty chunk
    val blank = Seq((1L, ""), (2L, "   "), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    assert(Curation.chunkDocuments(blank, "doc_id", "text", 16).count() == 0)
  }

  test("r9 operators honor the degenerate-input contracts") {
    // quality rules / stats: empty in, empty out; null text scores as
    // the 0-word doc, not a crash
    assert(TextAnalysis.gopherQualityRules(emptyDocs, "doc_id", "text").count() == 0)
    val nullText = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val g = TextAnalysis.gopherQualityRules(nullText, "doc_id", "text").head()
    assert(!g.getBoolean(6), "a null-text doc cannot pass the word floor")
    assert(TextAnalysis.corpusStats(
      Seq.empty[(String, String)].toDF("lang", "text"), "text", "lang").count() == 0)
    // span surgery and fuzzy decon: empty corpus in, empty out
    assert(Dedup.removeRepeatedSpans(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.fuzzyDecontaminate(emptyDocs, "doc_id", "text",
      emptyDocs, "doc_id", "text").count() == 0)
    // a non-empty corpus fully survives an EMPTY blocklist
    val docs = Seq((1L, "some words here repeated words here")).toDF("doc_id", "text")
    assert(Dedup.fuzzyDecontaminate(docs, "doc_id", "text",
      emptyDocs, "doc_id", "text").count() == 1)
    // split on empty: empty out (and the schema still carries `split`)
    val s = Curation.splitCorpus(emptyDocs, "doc_id", Seq("a" -> 1.0))
    assert(s.count() == 0 && s.columns.contains("split"))
    OperatorCache.releaseAll(spark)
  }

  test("semantic decontamination with an empty blocklist keeps everything") {
    val vecs = Seq((1L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    assert(Similarity.semanticDecontaminate(vecs, "embedding",
      emptyVecs, "embedding", 0.9).count() == 1)
    // and an empty corpus survives a non-empty blocklist
    assert(Similarity.semanticDecontaminate(emptyVecs, "embedding",
      vecs, "embedding", 0.9).count() == 0)
  }

  test("semantic dedup returns empty on an empty embedding corpus") {
    // zero rows -> zero centroids -> the typedlit centroid table is an
    // empty array; the assignment must yield zero rows, not null-centroid
    // rows or an ivfTrain crash
    assert(Similarity.semanticDedup(emptyVecs, "vec_id", "embedding",
      threshold = 0.9).count() == 0)
    OperatorCache.releaseAll(spark)
  }

  test("decontaminate with an empty blocklist keeps everything") {
    val docs = Seq((1L, "keep this document please")).toDF("doc_id", "text")
    assert(Dedup.decontaminate(docs, "doc_id", "text",
      emptyDocs, "doc_id", "text", shingleK = 2).count() == 1)
    OperatorCache.releaseAll(spark)
  }

  test("r12 audit/retention wave honors the degenerate-input contracts") {
    // attribution on an empty corpus: one row PER RULE (the report
    // shape survives), zero counts, null fail_frac (0/0) — not a crash
    val attr = TextAnalysis.filterAttribution(emptyDocs, "doc_id", "text").collect()
    assert(attr.length == 5 && attr.forall(r => r.getLong(1) == 0L && r.isNullAt(3)))
    assert(TextAnalysis.cooccurrencePmi(emptyDocs, "doc_id", "text", 2L).count() == 0)
    assert(Dedup.canonicalByQuality(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.winnowFingerprints(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.winnowOverlapPairs(emptyDocs, "doc_id", "text").count() == 0)
    assert(Curation.curriculumOrder(emptyDocs, "doc_id", "text",
      "text").count() == 0)
    assert(Curation.corpusDiff(emptyDocs, emptyDocs, "doc_id", "text").count() == 0)
    assert(Curation.contrastivePairs(emptyDocs, "doc_id", "text").count() == 0)
    assert(TextAnalysis.hashEmbed(emptyDocs, "doc_id", "text").count() == 0)
    // PSI of two empty sides: every bin carries the identical smoothed
    // fraction → drift exactly 0, not NaN
    val psi = TextAnalysis.driftPsi(emptyDocs, emptyDocs,
      Seq(("f", lit(0), 4))).collect()
    assert(psi.length == 1 && psi.head.getDouble(1) == 0.0)
    OperatorCache.releaseAll(spark)
  }

  test("r12 multimodal/event wave honors the degenerate-input contracts") {
    val noIds = Seq.empty[Long].toDF("doc_id")
    assert(Multimodal.imageNearDups(spark,
      Multimodal.patternedAssets(spark, noIds, "doc_id")).count() == 0)
    assert(Multimodal.audioMatches(spark,
      Multimodal.toneAssets(spark, noIds, "doc_id")).count() == 0)
    assert(Multimodal.videoNearDups(spark,
      Multimodal.videoAssets(spark, noIds, "doc_id")).count() == 0)
    val noEvents = Seq.empty[(Long, java.sql.Timestamp, String, Double, String)]
      .toDF("user_id", "ts", "event_type", "value", "props")
    assert(EventCorpus.propsStats(noEvents, "event_type", "props", "k", 5L).count() == 0)
    assert(EventCorpus.dialogueCorpus(noEvents, "user_id", "ts", "event_type",
      "value", "user_id", gap = "1 hour").count() == 0)
  }

  test("r14 incremental-curation/mixture wave honors the degenerate-input contracts") {
    // epochMixture: empty corpus → empty; a domain with only zero-token
    // docs and a positive target yields nothing (visible starvation,
    // not a divide-by-zero)
    assert(Curation.epochMixture(
      Seq.empty[(Long, String, Long)].toDF("id", "lang", "toks"),
      "id", "toks", "lang", Map("en" -> 100L)).count() == 0)
    val zeroTok = Seq((1L, "en", 0L), (2L, "en", 0L)).toDF("id", "lang", "toks")
    assert(Curation.epochMixture(zeroTok, "id", "toks", "lang",
      Map("en" -> 100L)).count() == 0)

    // curateReport on an empty corpus: full stage card, all zeros
    val report = TrainingPipeline.curateReport(emptyDocs, "doc_id", "text")
      .collect()
    assert(report.length == 7 &&
      report.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L))
    OperatorCache.releaseAll(spark)

    // an EMPTY batch through the incremental path: no survivors, state
    // advances to an identical state (no crash in the gate/confirm
    // joins on a zero-row suspect slice)
    val prev = Seq((1L, "the quick brown fox walks through the field " +
      "while seven farmers watch the morning clouds drift past"))
      .toDF("doc_id", "text")
    val state = TrainingPipeline.curateState(prev, "doc_id", "text",
      minQuality = 0.3, minWords = 5)
    assert(TrainingPipeline.curateIncremental(state, emptyDocs,
      "doc_id", "text").count() == 0)
    val advanced = TrainingPipeline.advanceState(state, emptyDocs,
      "doc_id", "text")
    assert(advanced.cleaned.count() == state.cleaned.count())
    assert(advanced.seenKeys.get.count() == state.seenKeys.get.count())
    OperatorCache.releaseAll(spark)
  }

  test("ANN recall audits honor the degenerate-input contracts") {
    // empty corpus → empty Lloyd codebooks: the audits must return an
    // empty card with the (qid, n_hit, recall) contract schema, not
    // crash building dense codebook tables
    val queries = Seq((1L, Seq.fill(64)(0.1f)))
      .toDF("qid", "qv").withColumn("qv", col("qv").cast("array<double>"))
    val vecs = emptyVecs.withColumn("embedding", col("embedding").cast("array<double>"))
    val pq = Similarity.pqRecallAudit(vecs, "vec_id", "embedding", queries,
      m = 4, kBook = 8, k = 10)
    assert(pq.columns.toSeq == Seq("qid", "n_hit", "recall") && pq.count() == 0)
    assert(Similarity.ivfRecallAudit(vecs, "vec_id", "embedding", queries,
      k = 10, ivfK = 4, nprobe = 2).count() == 0)
  }

  test("r14 third-wave operators honor the degenerate-input contracts") {
    val weights = Seq("train" -> 0.8, "val" -> 0.2)
    assert(Curation.leakageSafeSplit(emptyDocs, "doc_id", "text", weights)
      .count() == 0)
    assert(Curation.capPerStratum(
      Seq.empty[(Long, String)].toDF("id", "host"), "id", "host", 5).count() == 0)
    // leakage audit on empty pairs: one zeros row (the card contract)
    val zeros = Curation.splitLeakageAudit(
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"),
      Seq((1L, "train")).toDF("doc_id", "split"), "doc_id")
      .head()
    assert(zeros.getLong(0) == 0 && zeros.getLong(1) == 0)
    // agreement on an all-null or empty frame: n = 0, null kappa
    val k = Agreement.cohenKappa(
      Seq.empty[(String, String)].toDF("a", "b"), "a", "b").head()
    assert(k.getLong(0) == 0 && k.isNullAt(3))
    assert(Agreement.majorityVote(
      Seq.empty[(Long, String, String)].toDF("id", "a", "b"),
      "id", Seq("a", "b")).count() == 0)
    // concentration of an empty frame: one row, null-safe fields
    assert(Profiling.concentration(
      Seq.empty[Tuple1[String]].toDF("k"), "k").count() == 1)
    // URL normalization: nulls pass through as nulls, empty string as empty
    val u = Seq((null.asInstanceOf[String], "")).toDF("a", "b")
      .select(Urls.normalizeUrl(col("a")), Urls.normalizeUrl(col("b")),
        Urls.hostOf(col("b"))).head()
    assert(u.isNullAt(0) && u.getString(1) == "" && u.getString(2) == "")
    OperatorCache.releaseAll(spark)
  }

  test("batched layout probes return empty on an empty workload") {
    val vecs = (0L until 60L)
      .map(i => (i, Seq.tabulate(8)(d => ((i % 5) + d).toFloat / 5f)))
      .toDF("vec_id", "embedding")
    val coarse = Similarity.ivfTrain(vecs, "vec_id", "embedding", k = 2)
    val books = Similarity.trainPq(vecs, "vec_id", "embedding", m = 2, k = 2)
    val resBooks = Similarity.trainPqResidual(
      vecs, "vec_id", "embedding", coarse, m = 2, k = 2)
    val base = "target/graft-tmp/empty-batch-probe"
    Similarity.writeIvfPq(vecs, "embedding", s"$base/pq", coarse, books)
    Similarity.writeIvfPqResidual(
      vecs, "embedding", s"$base/res", coarse, resBooks)
    Similarity.writeIndexed(vecs, "embedding", s"$base/lsh", planes = 2)
    val w = Seq.empty[(Long, Seq[Float])].toDF("qid", "qv")
    val pq = Similarity.probeIvfPqBatch(w, "qid", "qv", s"$base/pq",
      "vec_id", "embedding", coarse, books, k = 3)
    assert(pq.count() == 0 &&
      pq.columns.toSeq == Seq("qid", "rank", "vec_id", "cosine"))
    assert(Similarity.probeIvfPqResidualBatch(w, "qid", "qv", s"$base/res",
      "vec_id", "embedding", coarse, resBooks, k = 3).count() == 0)
    val lsh = Similarity.probeIndexedBatch(w, "qid", "qv", s"$base/lsh",
      "vec_id", "embedding", k = 3, planes = 2)
    assert(lsh.count() == 0 &&
      lsh.columns.toSeq == Seq("qid", "rank", "vec_id", "cosine"))
    OperatorCache.releaseAll(spark)
  }
}
