package graft.pipeline

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Quality floors for the approximate ANN paths, measured against the
  * exact brute-force answer on the real embeddings table: an index whose
  * recall silently decays is worse than no index, so these pin the
  * settings the serving paths advertise (multi-probe LSH, IVF nprobe,
  * SQ8 rescoring) to measured floors. Floors are set ~0.1 under the
  * observed values to absorb fixture drift, not to excuse regressions.
  */
class AnnRecallSpec extends SparkSpec {

  private lazy val corpus =
    Tables.load(spark, sf, "embeddings").persist()

  private lazy val queries: Seq[Seq[Float]] =
    corpus.orderBy("vec_id").limit(5)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toSeq).toSeq

  private val K = 10

  test("exact search has recall 1.0 against itself") {
    val q = queries.head
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, K)
    assert(Similarity.recallAtK(exact, exact, "vec_id") == 1.0)
  }

  test("planesFor sizes the bucket count to the corpus") {
    assert(Similarity.planesFor(500) == 1) // tiny corpus: don't prune
    assert(Similarity.planesFor(1000000) == 10) // ~1k buckets of ~1k
    assert(Similarity.planesFor(100000000) == 17)
    assert(Similarity.planesFor(Long.MaxValue) == 54)
    assert(Similarity.planesFor(Long.MaxValue, 1) == 62) // clamp: one long
  }

  test("multi-probe LSH at planesFor-sized buckets holds its recall floor") {
    val planes = Similarity.planesFor(corpus.count())
    val r = Similarity.meanRecallAtK(corpus, "vec_id", "embedding", queries, K)(
      q => Similarity.annTopK(corpus, "vec_id", "embedding", q, K, planes = planes))
    info(f"LSH multi-probe recall@$K (planes=$planes) = $r%.2f")
    assert(r >= 0.95, f"LSH recall@$K degraded to $r%.2f")
  }

  test("multi-probe LSH recall degrades as pruning sharpens (measured curve)") {
    // planes=4 scans ~5/16 of the fixture corpus: measured 0.54 —
    // the floor guards the tradeoff's SHAPE, not a tuned number
    val r = Similarity.meanRecallAtK(corpus, "vec_id", "embedding", queries, K)(
      q => Similarity.annTopK(corpus, "vec_id", "embedding", q, K, planes = 4))
    info(f"LSH multi-probe recall@$K (planes=4) = $r%.2f")
    assert(r >= 0.4, f"LSH recall@$K degraded to $r%.2f")
  }

  test("PQ ADC + exact rescoring holds a recall floor; params validated") {
    val books = Similarity.trainPq(corpus, "vec_id", "embedding", m = 8, k = 16)
    assert(books.length == 8)
    val r = Similarity.meanRecallAtK(corpus, "vec_id", "embedding", queries, K)(
      q => Similarity.pqTopK(corpus, "vec_id", "embedding", books, q, K,
        rescoreFactor = 10))
    info(f"PQ recall@$K (m=8, k=16, rescore 10x) = $r%.2f")
    // the floor guards the two-stage shape at these settings (8×16
    // codebooks, 10× exact rescore = a 5% candidate scan); observed
    // 0.72, floor ~0.1 under like the other ANN floors
    assert(r >= 0.6, f"PQ recall@$K degraded to $r%.2f")
    // m must divide the dimension
    intercept[IllegalArgumentException](
      Similarity.trainPq(corpus, "vec_id", "embedding", m = 7, k = 4))
  }

  test("appendIvfPq: an appended batch serves identically to a rebuilt index") {
    // split the corpus: base written first, batch appended with the SAME
    // frozen centroids/codebooks — probing the appended layout must equal
    // probing a layout built from the whole corpus in one shot
    val base = corpus.where(col("vec_id") % 5 =!= 0)
    val batch = corpus.where(col("vec_id") % 5 === 0)
    val coarse = Similarity.ivfTrain(base, "vec_id", "embedding", k = 8)
    val books = Similarity.trainPq(base, "vec_id", "embedding", m = 8, k = 16)

    val appended = "target/graft-tmp/ivfpq-appended"
    Similarity.writeIvfPq(base, "embedding", appended, coarse, books)
    Similarity.appendIvfPq(batch, "embedding", appended, coarse, books)
    val rebuilt = "target/graft-tmp/ivfpq-rebuilt"
    Similarity.writeIvfPq(corpus, "embedding", rebuilt, coarse, books)

    for (q <- queries.take(2)) {
      def served(path: String) = Similarity.probeIvfPq(spark, path,
        "vec_id", "embedding", coarse, books, q, K, nprobe = 6, rescoreFactor = 10)
        .collect().map(_.getLong(0)).toSeq
      assert(served(appended) == served(rebuilt),
        "append must be indistinguishable from a rebuild at serve time")
    }
    // sanity: appended rows are actually reachable (a batch id can win)
    val all = spark.read.parquet(appended)
    assert(all.count() == corpus.count(), "no rows lost or duplicated")
  }

  test("appendIndexed: LSH layout append serves old and new rows through one pruned scan") {
    val base = corpus.where(col("vec_id") % 5 =!= 0)
    val batch = corpus.where(col("vec_id") % 5 === 0)
    val path = "target/graft-tmp/lsh-appended"
    val planes = 4
    Similarity.writeIndexed(base, "embedding", path, planes)
    Similarity.appendIndexed(batch, "embedding", path, planes)
    val q = queries.head
    val served = Similarity.probeIndexed(spark, path, "vec_id", "embedding",
      q, K, planes).collect().map(_.getLong(0)).toSeq
    val direct = Similarity.annTopK(corpus, "vec_id", "embedding", q, K,
      planes).collect().map(_.getLong(0)).toSeq
    assert(served == direct,
      "appended layout must serve exactly what the in-memory LSH path returns")
  }

  test("IVF-PQ composition holds a recall floor and matches its serving layout") {
    val coarse = Similarity.ivfTrain(corpus, "vec_id", "embedding", k = 8)
    val books = Similarity.trainPq(corpus, "vec_id", "embedding", m = 8, k = 16)
    val r = Similarity.meanRecallAtK(corpus, "vec_id", "embedding", queries, K)(
      q => Similarity.ivfPqTopK(corpus, "vec_id", "embedding", coarse, books,
        q, K, nprobe = 6, rescoreFactor = 10))
    info(f"IVF-PQ recall@$K (nprobe=6, m=8, k=16, rescore 10x) = $r%.2f")
    // the composition can lose to BOTH sources of approximation (cell
    // pruning + code quantization); floor set under the observed value
    // like the single-level floors
    assert(r >= 0.55, f"IVF-PQ recall@$K degraded to $r%.2f")

    // serving layout: codes stored, partitions pruned, results identical
    val path = "target/graft-tmp/ivfpq-index"
    Similarity.writeIvfPq(corpus, "embedding", path, coarse, books)
    val q = queries.head
    val served = Similarity.probeIvfPq(spark, path, "vec_id", "embedding",
      coarse, books, q, K, nprobe = 6, rescoreFactor = 10)
    val direct = Similarity.ivfPqTopK(corpus, "vec_id", "embedding",
      coarse, books, q, K, nprobe = 6, rescoreFactor = 10)
    assert(served.collect().map(_.getLong(0)).toSeq ==
      direct.collect().map(_.getLong(0)).toSeq,
      "stored-code probe must reproduce the in-memory composition")
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [centroid"),
      s"expected centroid-pruned scan, got:\n${plan.take(600)}")
  }

  test("residual IVF-PQ holds its floor and does not lose to raw-vector IVF-PQ") {
    val coarse = Similarity.ivfTrain(corpus, "vec_id", "embedding", k = 8)
    val raw = Similarity.trainPq(corpus, "vec_id", "embedding", m = 8, k = 16)
    val res = Similarity.trainPqResidual(corpus, "vec_id", "embedding",
      coarse, m = 8, k = 16)
    def recall(f: Seq[Float] => org.apache.spark.sql.DataFrame) =
      Similarity.meanRecallAtK(corpus, "vec_id", "embedding", queries, K)(f)
    val rRaw = recall(q => Similarity.ivfPqTopK(corpus, "vec_id", "embedding",
      coarse, raw, q, K, nprobe = 6, rescoreFactor = 10))
    val rRes = recall(q => Similarity.ivfPqResidualTopK(corpus, "vec_id",
      "embedding", coarse, res, q, K, nprobe = 6, rescoreFactor = 10))
    info(f"IVF-PQ recall@$K raw=$rRaw%.2f residual=$rRes%.2f")
    // observed 0.92 (vs raw 0.72 — the residual win is real and large
    // even at fixture scale); floor ~0.1 under, house style
    assert(rRes >= 0.8, f"residual IVF-PQ recall@$K degraded to $rRes%.2f")
    // the residual codebooks spend their resolution on within-cell
    // structure — at identical code size they must not do WORSE than
    // quantizing raw vectors (the reason IndexIVFPQ encodes residuals);
    // allow one borderline rank flip of noise at fixture scale
    assert(rRes >= rRaw - 0.05,
      f"residual codebooks lost to raw: $rRes%.2f vs $rRaw%.2f")

    // residual serving layout: stored residual codes, pruned partitions,
    // identical results to the in-memory composition
    val path = "target/graft-tmp/ivfpq-res-index"
    Similarity.writeIvfPqResidual(corpus, "embedding", path, coarse, res)
    val q = queries.head
    val served = Similarity.probeIvfPqResidual(spark, path, "vec_id",
      "embedding", coarse, res, q, K, nprobe = 6, rescoreFactor = 10)
    val direct = Similarity.ivfPqResidualTopK(corpus, "vec_id", "embedding",
      coarse, res, q, K, nprobe = 6, rescoreFactor = 10)
    assert(served.collect().map(_.getLong(0)).toSeq ==
      direct.collect().map(_.getLong(0)).toSeq,
      "stored-residual-code probe must reproduce the in-memory path")
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [centroid"),
      s"expected centroid-pruned scan, got:\n${plan.take(600)}")
  }

  test("IVF recall rises with nprobe and holds its floors") {
    val index = Similarity.ivfTrain(corpus, "vec_id", "embedding", k = 8)
    def recall(nprobe: Int) =
      Similarity.meanRecallAtK(corpus, "vec_id", "embedding", queries, K)(
        q => Similarity.ivfTopK(corpus, "vec_id", "embedding", index, q, K, nprobe = nprobe))
    val r4 = recall(4) // measured 0.72
    val r6 = recall(6) // measured 0.96
    info(f"IVF recall@$K nprobe=4: $r4%.2f, nprobe=6: $r6%.2f")
    assert(r4 >= 0.6, f"IVF nprobe=4 recall@$K degraded to $r4%.2f")
    assert(r6 >= 0.85, f"IVF nprobe=6 recall@$K degraded to $r6%.2f")
    assert(r6 >= r4, "recall must not fall as nprobe grows")
  }

  test("probeIvfPqBatch: one pruned pass equals the per-query probe loop, " +
      "through deletes") {
    val coarse = Similarity.ivfTrain(corpus, "vec_id", "embedding", k = 8)
    val books = Similarity.trainPq(corpus, "vec_id", "embedding", m = 8, k = 16)
    val path = "target/graft-tmp/ivfpq-batch"
    Similarity.writeIvfPq(corpus, "embedding", path, coarse, books)
    import spark.implicits._
    val workload = queries.zipWithIndex
      .map { case (q, i) => (i.toLong, q) }.toDF("qid", "qv")
    def loopRows() = queries.zipWithIndex.flatMap { case (q, i) =>
      Similarity.probeIvfPq(spark, path, "vec_id", "embedding", coarse,
        books, q, K, nprobe = 6, rescoreFactor = 10).collect().zipWithIndex
        .map { case (r, j) => (i.toLong, j + 1, r.getLong(0), r.getDouble(1)) }
    }.toSet
    def batchDf() = Similarity.probeIvfPqBatch(workload, "qid", "qv", path,
      "vec_id", "embedding", coarse, books, K, nprobe = 6, rescoreFactor = 10)
    def batchRows() = batchDf().collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(batchRows() == loopRows(),
      "batch probe must equal the per-query loop, rank for rank")
    // plan pins: the whole workload is served by ONE centroid-pruned
    // scan of the layout (the loop pays one scan job per query)
    val plan = batchDf().queryExecution.executedPlan.toString
    val pruned = "PartitionFilters: \\[centroid".r.findAllIn(plan).length
    assert(pruned == 1,
      s"expected exactly one centroid-pruned layout scan, got $pruned:\n${plan.take(800)}")
    // tombstoned deletes flow through the same pruned pass
    Similarity.deleteFromIndex(
      corpus.where(col("vec_id") % 3 === 0).select("vec_id"), "vec_id", path)
    val afterDelete = batchRows()
    assert(afterDelete == loopRows(),
      "batch probe must equal the loop after a tombstone delete")
    assert(!afterDelete.exists(_._3 % 3 == 0),
      "deleted ids must not surface in the batch probe")
  }

  test("probeIvfPqResidualBatch equals the per-query residual probe loop") {
    val coarse = Similarity.ivfTrain(corpus, "vec_id", "embedding", k = 8)
    val books = Similarity.trainPqResidual(corpus, "vec_id", "embedding",
      coarse, m = 8, k = 16)
    val path = "target/graft-tmp/ivfpq-res-batch"
    Similarity.writeIvfPqResidual(corpus, "embedding", path, coarse, books)
    import spark.implicits._
    val workload = queries.zipWithIndex
      .map { case (q, i) => (i.toLong, q) }.toDF("qid", "qv")
    val got = Similarity.probeIvfPqResidualBatch(workload, "qid", "qv", path,
      "vec_id", "embedding", coarse, books, K, nprobe = 6, rescoreFactor = 10)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val want = queries.zipWithIndex.flatMap { case (q, i) =>
      Similarity.probeIvfPqResidual(spark, path, "vec_id", "embedding",
        coarse, books, q, K, nprobe = 6, rescoreFactor = 10)
        .collect().zipWithIndex
        .map { case (r, j) => (i.toLong, j + 1, r.getLong(0), r.getDouble(1)) }
    }.toSet
    assert(got == want,
      "residual batch probe must equal the per-query loop, rank for rank")
  }

  test("probeIndexedBatch equals the per-query LSH probe loop") {
    val path = "target/graft-tmp/lsh-batch"
    val planes = 4
    Similarity.writeIndexed(corpus, "embedding", path, planes)
    import spark.implicits._
    val workload = queries.zipWithIndex
      .map { case (q, i) => (i.toLong, q) }.toDF("qid", "qv")
    val got = Similarity.probeIndexedBatch(workload, "qid", "qv", path,
      "vec_id", "embedding", K, planes).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val want = queries.zipWithIndex.flatMap { case (q, i) =>
      Similarity.probeIndexed(spark, path, "vec_id", "embedding", q, K,
        planes).collect().zipWithIndex
        .map { case (r, j) => (i.toLong, j + 1, r.getLong(0), r.getDouble(1)) }
    }.toSet
    assert(got == want,
      "LSH batch probe must equal the per-query loop, rank for rank")
  }

  test("probeIndexedBatch regimes: isin-pruned scan below the bucket cap, " +
      "join-only (no driver enumeration) above it") {
    val path = "target/graft-tmp/lsh-batch-regimes"
    val planes = 4
    Similarity.writeIndexed(corpus, "embedding", path, planes)
    import spark.implicits._
    val workload = queries.zipWithIndex
      .map { case (q, i) => (i.toLong, q) }.toDF("qid", "qv")
    val want = queries.zipWithIndex.flatMap { case (q, i) =>
      Similarity.probeIndexed(spark, path, "vec_id", "embedding", q, K,
        planes).collect().zipWithIndex
        .map { case (r, j) => (i.toLong, j + 1, r.getLong(0), r.getDouble(1)) }
    }.toSet
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // BELOW the cap (default): bucket union pushed as a partition
    // filter, workload broadcast into the pruned scan
    val below = Similarity.probeIndexedBatch(workload, "qid", "qv", path,
      "vec_id", "embedding", K, planes)
    val belowPlan = below.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[bucket".r.findFirstIn(belowPlan).isDefined,
      s"pruned regime must push the bucket union into PartitionFilters:\n${belowPlan.take(800)}")
    assert(belowPlan.contains("BroadcastHashJoin"),
      "pruned regime must broadcast the workload into the pruned scan")
    assert(rows(below) == want, "pruned regime must equal the loop")
    // ABOVE the cap (forced with cap=1 on the fixture): no bucket
    // enumeration — the scan carries NO static bucket partition filter,
    // the workload meets it through the equi-join alone
    val above = Similarity.probeIndexedBatch(workload, "qid", "qv", path,
      "vec_id", "embedding", K, planes, maxPrunedBuckets = 1)
    val abovePlan = above.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[bucket".r.findFirstIn(abovePlan).isEmpty,
      s"join regime must not enumerate buckets into the scan:\n${abovePlan.take(800)}")
    assert(rows(above) == want, "join regime must equal the loop")
    // THIRD regime (r19 VERDICT item 2 — prune and join strategy are
    // independent): small bucket union + BIG workload keeps the isin
    // partition-prune but must NOT carry the broadcast hint (the probe
    // frame holds full query vectors — a 10⁶-query broadcast is a job
    // abort). With auto-broadcast disabled the plan must survive as a
    // shuffle join; the hinted small-workload path must still broadcast.
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bulk = Similarity.probeIndexedBatch(workload, "qid", "qv", path,
        "vec_id", "embedding", K, planes, maxBroadcastQueries = 1)
      val bulkPlan = bulk.queryExecution.executedPlan.toString
      assert("PartitionFilters: \\[bucket".r.findFirstIn(bulkPlan).isDefined,
        s"bulk regime keeps the partition prune:\n${bulkPlan.take(800)}")
      assert(!bulkPlan.contains("BroadcastHashJoin"),
        s"bulk regime must not broadcast the workload:\n${bulkPlan.take(800)}")
      assert(rows(bulk) == want, "bulk regime must equal the loop")
      val hinted = Similarity.probeIndexedBatch(workload, "qid", "qv", path,
        "vec_id", "embedding", K, planes)
      assert(hinted.queryExecution.executedPlan.toString
          .contains("BroadcastHashJoin"),
        "small-workload path must broadcast via the hint, not the threshold")
      assert(rows(hinted) == want, "hinted regime must equal the loop")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
  }

  test("layoutKind + probeBatchAuto: meta-dispatched serving equals each " +
      "family's direct batch probe (r18 VERDICT item 5)") {
    import spark.implicits._
    val coarse = Similarity.ivfTrain(corpus, "vec_id", "embedding", k = 8)
    val rawBooks = Similarity.trainPq(corpus, "vec_id", "embedding", m = 8, k = 16)
    val resBooks = Similarity.trainPqResidual(corpus, "vec_id", "embedding",
      coarse, m = 8, k = 16)
    val base = "target/graft-tmp/layout-dispatch"
    Similarity.writeIndexed(corpus, "embedding", s"$base/lsh", planes = 4)
    Similarity.writeIvfPq(corpus, "embedding", s"$base/raw", coarse, rawBooks)
    Similarity.writeIvfPqResidual(corpus, "embedding", s"$base/res",
      coarse, resBooks)
    assert(Similarity.layoutKind(spark, s"$base/lsh") ==
      Similarity.LayoutKind.Lsh(4, 42L))
    assert(Similarity.layoutKind(spark, s"$base/raw") ==
      Similarity.LayoutKind.IvfPq)
    assert(Similarity.layoutKind(spark, s"$base/res") ==
      Similarity.LayoutKind.IvfPqResidual)
    val workload = queries.zipWithIndex
      .map { case (q, i) => (i.toLong, q) }.toDF("qid", "qv")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(rows(Similarity.probeBatchAuto(workload, "qid", "qv",
        s"$base/lsh", "vec_id", "embedding", K)) ==
      rows(Similarity.probeIndexedBatch(workload, "qid", "qv",
        s"$base/lsh", "vec_id", "embedding", K, planes = 4)),
      "auto over the LSH layout must equal the direct LSH batch probe")
    assert(rows(Similarity.probeBatchAuto(workload, "qid", "qv",
        s"$base/raw", "vec_id", "embedding", K, Some(coarse), rawBooks)) ==
      rows(Similarity.probeIvfPqBatch(workload, "qid", "qv",
        s"$base/raw", "vec_id", "embedding", coarse, rawBooks, K)),
      "auto over the raw layout must equal probeIvfPqBatch")
    assert(rows(Similarity.probeBatchAuto(workload, "qid", "qv",
        s"$base/res", "vec_id", "embedding", K, Some(coarse), resBooks)) ==
      rows(Similarity.probeIvfPqResidualBatch(workload, "qid", "qv",
        s"$base/res", "vec_id", "embedding", coarse, resBooks, K)),
      "auto over the residual layout must equal probeIvfPqResidualBatch")
    // a PQ layout with no artifacts fails fast, not silently wrong
    intercept[IllegalArgumentException] {
      Similarity.probeBatchAuto(workload, "qid", "qv",
        s"$base/raw", "vec_id", "embedding", K)
    }
  }

  test("probeIvfPqBatch plan: workload meets cells through a broadcast " +
      "hash join, never a shuffle of the pruned scan") {
    val coarse = Similarity.ivfTrain(corpus, "vec_id", "embedding", k = 8)
    val books = Similarity.trainPq(corpus, "vec_id", "embedding", m = 8, k = 16)
    val path = "target/graft-tmp/ivfpq-batch-plan"
    Similarity.writeIvfPq(corpus, "embedding", path, coarse, books)
    import spark.implicits._
    val workload = queries.zipWithIndex
      .map { case (q, i) => (i.toLong, q) }.toDF("qid", "qv")
    val plan = Similarity.probeIvfPqBatch(workload, "qid", "qv", path,
      "vec_id", "embedding", coarse, books, K)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"probe pairs must broadcast into the pruned scan:\n${plan.take(800)}")
    assert(!plan.contains("SortMergeJoin"),
      "the corpus-side scan must never shuffle for the workload join")
  }

  test("evalRetrieval scores the batch probe against exact top-k (recall " +
      "composition)") {
    val coarse = Similarity.ivfTrain(corpus, "vec_id", "embedding", k = 8)
    val books = Similarity.trainPq(corpus, "vec_id", "embedding", m = 8, k = 16)
    val path = "target/graft-tmp/ivfpq-batch-eval"
    Similarity.writeIvfPq(corpus, "embedding", path, coarse, books)
    import spark.implicits._
    val workload = queries.zipWithIndex
      .map { case (q, i) => (i.toLong, q) }.toDF("qid", "qv")
    val run = Similarity.probeIvfPqBatch(workload, "qid", "qv", path,
      "vec_id", "embedding", coarse, books, K, nprobe = 6, rescoreFactor = 10)
    // qrels = the exact answer (rel 1 each): recall@k from evalRetrieval
    // IS recall in the p90-audit sense, and mean nDCG has the same floor
    val qrels = queries.zipWithIndex.flatMap { case (q, i) =>
      Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, K)
        .collect().map(r => (i.toLong, r.getLong(0), 1))
    }.toDF("qid", "doc", "rel")
    val m = TextSearch.evalRetrieval(run, "qid", "vec_id", "rank",
      qrels, "qid", "doc", "rel", k = K).collect()
    assert(m.length == queries.size, "one metric row per query")
    val meanRecall = m.map(_.getDouble(4)).sum / m.length
    info(f"batch-probe recall@$K via evalRetrieval = $meanRecall%.2f")
    assert(meanRecall >= 0.55,
      f"composition must reproduce the p90-style floor: $meanRecall%.2f")
    m.foreach { r =>
      assert(r.getLong(1) == K && r.getDouble(3) == r.getDouble(4),
        s"with |qrels| = k, precision@k must equal recall@k: $r")
    }
  }

  test("release gate: the one-call served RRF holds a pinned quality " +
      "floor against the exact fusion (r18 VERDICT item 7)") {
    import spark.implicits._
    // controlled text side: one doc per vector, text carries its label
    // as a word, so BM25 behaves identically in the served run and the
    // exact baseline and the only moving part is the ANN serving path
    val docs = corpus.select(col("vec_id"),
      concat(lit("cluster word"), col("label"),
        lit(" embedding document")).as("text"))
    val base = "target/graft-tmp/rrf-release-gate"
    TextSearch.writeIndex(docs, "vec_id", "text", s"$base/bm25")
    val coarse = Similarity.ivfTrain(corpus, "vec_id", "embedding", k = 8)
    val books = Similarity.trainPq(corpus, "vec_id", "embedding", m = 8, k = 16)
    Similarity.writeIvfPq(corpus, "embedding", s"$base/ann", coarse, books)
    OperatorCache.releaseAll(spark)
    val qlabels = corpus.orderBy("vec_id").limit(5)
      .select("label").collect().map(_.getInt(0))
    val workload = queries.zip(qlabels).zipWithIndex.map {
      case ((qv, l), i) => (i.toLong, s"cluster word$l", qv)
    }.toDF("qid", "query", "qv")
    // qrels = the EXACT fusion (brute-force cosine ranks through the
    // same RRF), rel 1 per returned doc — the ideal the serving path
    // approximates; a layout/probe regression drops recall against it
    val qrels = TextSearch.searchRrfBatch(workload, "qid", "query", "qv",
      s"$base/bm25", corpus, "vec_id", "embedding", k = K, candidates = 20)
      .select(col("qid"), col("doc"), lit(1).as("rel"))
    val served = TextSearch.searchRrfServedAuto(workload, "qid", "query",
      "qv", s"$base/bm25", s"$base/ann", "vec_id", "embedding",
      Some(coarse), books, k = K, candidates = 20,
      nprobe = 6, rescoreFactor = 10)
    val m = TextSearch.evalRetrieval(served, "qid", "doc", "rank",
      qrels, "qid", "doc", "rel", k = K).collect()
    assert(m.length == queries.size, "one metric row per query")
    val meanRecall = m.map(_.getDouble(4)).sum / m.length
    val meanNdcg = m.map(_.getDouble(6)).sum / m.length
    info(f"served-RRF vs exact fusion: recall@$K = $meanRecall%.2f, " +
      f"nDCG@$K = $meanNdcg%.2f")
    // floors ~0.1 under observed (the suite's convention): a serving
    // regression — drifted layout, broken probe pruning, rank bug —
    // fails HERE, in the production one-call path, not only in the
    // recall-audit cards
    assert(meanRecall >= 0.85,
      f"served RRF recall@$K fell to $meanRecall%.2f (observed 0.98)")
    assert(meanNdcg >= 0.85,
      f"served RRF nDCG@$K fell to $meanNdcg%.2f (observed 0.99)")
    OperatorCache.releaseAll(spark)
  }

  test("SQ8 two-stage rescoring is near-exact") {
    val quantized = Similarity.quantizeSq8(corpus, "embedding").persist()
    quantized.count()
    val r = Similarity.meanRecallAtK(corpus, "vec_id", "embedding", queries, K)(
      q => Similarity.sq8TopK(quantized, "vec_id", "embedding", q, K))
    quantized.unpersist()
    info(f"SQ8 rescored recall@$K = $r%.2f")
    assert(r >= 0.9, f"SQ8 recall@$K degraded to $r%.2f")
  }
}
