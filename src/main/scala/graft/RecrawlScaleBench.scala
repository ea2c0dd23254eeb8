package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{OperatorCache, TrainingPipeline}

/** Measures the claim behind the incremental curation family: that a
  * recrawl batch costs BATCH work, not corpus work. Splits the
  * documents table into a 70% prior corpus and three 10% batches, then
  * runs both paths —
  *
  *   A (recompute): after each batch, re-curate prev ∪ batches(0..i)
  *     from scratch (what a pipeline without state does);
  *   B (incremental): build CurateState once and persist it as the
  *     parquet layout, then per batch curateIncremental + appendState
  *     (the production loop: batch-sized appends, prior state never
  *     rewritten).
  *
  * and asserts the two paths keep the SAME batch survivors before
  * printing the timing table (a speedup over a wrong answer is not a
  * result). Path A's cost grows with the accumulated corpus; path B's
  * per-batch cost tracks the batch. Usage:
  *   tools/run.sh graft.RecrawlScaleBench [sfDir]
  */
object RecrawlScaleBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (sys.env.contains("RECRAWL_PROFILE")) {
      import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
      val t0 = new scala.collection.concurrent.TrieMap[Int, (Long, String)]
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onJobStart(js: SparkListenerJobStart): Unit =
          t0(js.jobId) = (System.nanoTime(),
            Option(js.properties).flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("").take(90))
        override def onJobEnd(je: SparkListenerJobEnd): Unit =
          t0.get(je.jobId).foreach { case (t, d) =>
            val sec = (System.nanoTime() - t) / 1e9
            if (sec > 0.5) println(f"    job ${je.jobId}%3d $sec%6.2f s  $d")
          }
      })
    }

    val docs = Tables.load(spark, dir, "documents").select("doc_id", "text")
    // prior share in percent (default 70 → three 10% batches); at 97 the
    // three 1% batches model the real recrawl ratio, where the corpus
    // dwarfs the batch. Cuts are id PERCENTILES, not max-id fractions —
    // replica-offset test sets have sparse id spaces where a max-id
    // fraction can land between populated ranges and empty a batch.
    val prevPct = sys.env.getOrElse("RECRAWL_PREV_PCT", "70").toDouble
    val fracs = (0 to 3).map(i => (prevPct + i * (100.0 - prevPct) / 3) / 100.0)
    val cuts = docs
      .selectExpr(s"percentile(doc_id, array(${fracs.mkString(",")})) AS c")
      .head().getSeq[Double](0).map(_.toLong)
    val prev = docs.where(col("doc_id") <= cuts(0))
    val batches = (0 until 3).map(i =>
      docs.where(col("doc_id") > cuts(i) && col("doc_id") <= cuts(i + 1)))

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def survivors(df: org.apache.spark.sql.DataFrame): Set[Long] = {
      val s = df.select("doc_id").collect().map(_.getLong(0)).toSet
      OperatorCache.releaseAll(spark)
      s
    }

    // Path A: re-curate the whole accumulated corpus after each batch,
    // keeping only the new batch's survivors for the comparison
    val recompute = (0 until 3).map { i =>
      val corpus = (0 to i).foldLeft(prev)((d, j) => d.union(batches(j)))
      val (s, sec) = timed(survivors(
        TrainingPipeline.curate(corpus, "doc_id", "text",
          minQuality = 0.3, minWords = 20, spanK = 0)
          .where(col("doc_id") > cuts(i))))
      (s, sec)
    }

    // Path B: the production loop — state built and parquet-persisted
    // once, then per batch curateIncremental + appendState (batch-sized
    // parquet appends; the prior corpus state is never rewritten)
    val stateDir = "target/graft-tmp/recrawl-state"
    val (state0, stateSec) = timed {
      val s = TrainingPipeline.curateState(prev, "doc_id", "text",
        minQuality = 0.3, minWords = 20)
      TrainingPipeline.writeState(s, stateDir)
      OperatorCache.releaseAll(spark)
      TrainingPipeline.readState(spark, stateDir)
    }
    var state = state0
    val incremental = (0 until 3).map { i =>
      println(s"--- incremental batch ${i + 1}")
      val (s, sec) = timed(survivors(
        TrainingPipeline.curateIncremental(state, batches(i), "doc_id", "text")))
      val (next, advSec) = timed {
        val a = TrainingPipeline.appendState(
          state, batches(i), "doc_id", "text", stateDir,
          batchId = Some(s"bench_batch_$i"))
        OperatorCache.releaseAll(spark)
        a
      }
      state = next
      (s, sec, advSec)
    }

    (0 until 3).foreach { i =>
      require(recompute(i)._1 == incremental(i)._1,
        s"batch $i survivor mismatch: recompute=${recompute(i)._1.size} " +
          s"incremental=${incremental(i)._1.size} " +
          s"onlyRecompute=${(recompute(i)._1 -- incremental(i)._1).toSeq.sorted.take(5)} " +
          s"onlyIncremental=${(incremental(i)._1 -- recompute(i)._1).toSeq.sorted.take(5)}")
    }

    println(f"state build (once): $stateSec%7.2f s")
    println(f"${"batch"}%8s ${"recompute"}%10s ${"incremental"}%12s ${"advance"}%8s ${"survivors"}%10s")
    (0 until 3).foreach { i =>
      println(f"${i + 1}%8d ${recompute(i)._2}%9.2f s ${incremental(i)._2}%11.2f s " +
        f"${incremental(i)._3}%7.2f s ${incremental(i)._1.size}%10d")
    }
    val totA = recompute.map(_._2).sum
    val totB = stateSec + incremental.map(r => r._2 + r._3).sum
    println(f"TOTAL    recompute $totA%7.2f s   incremental $totB%7.2f s " +
      f"(x${totA / totB}%.2f; marginal batch: x${recompute.last._2 / (incremental.last._2 + incremental.last._3)}%.2f)")
    spark.stop()
  }
}
