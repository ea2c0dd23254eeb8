package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{Curation, Dedup, OperatorCache, TextAnalysis, TrainingPipeline}

/** Scale proof for the four heaviest r12/r13 plans (PLANS.md):
  * gopher repetition stats (p58), Kneser–Ney trigram NLL (p66),
  * contrastive pair mining (p84), and the sampled LSH recall audit
  * (p92 — the production form of p89). Replicates the sf0.1 documents
  * corpus ×N with remapped ids (so near-dup structure and n-gram
  * statistics scale with the corpus) and reports wall time + Spark job
  * count per operator — the ×1/×10/×20 growth table the smaller
  * operators already have.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/run.sh \
  *   graft.HeavyScaleBench [replicas] [label-substring,...]
  */
object HeavyScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicas = args.headOption.map(_.toInt).getOrElse(10)
    val onlyOps = args.drop(1).headOption.map(_.split(',').toSeq)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-heavy-scale")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobEnd(je: SparkListenerJobEnd): Unit = jobs.incrementAndGet()
    })

    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val maxId = docs.agg(max("doc_id")).head().getLong(0) + 1L
    val scaled = docs
      .withColumn("copy", explode(sequence(lit(0), lit(replicas - 1))))
      .select((col("doc_id") + col("copy") * maxId).as("doc_id"), col("text"))
      .persist()
    val nDocs = scaled.count()
    println(s"=== heavy ops at ×$replicas ($nDocs docs)")

    def timed(label: String)(f: => Long): Unit = {
      if (onlyOps.exists(!_.exists(label.contains))) return
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s  " +
        f"jobs=${jobs.get() - j0}%3d  rows=$n")
      OperatorCache.releaseAll(spark)
      spark.sharedState.cacheManager.clearCache()
    }

    timed("p58 gopher_repetition") {
      TextAnalysis.gopherRepetitionStats(scaled, "doc_id", "text").count()
    }
    timed("p66 kneser_ney") {
      TextAnalysis.kneserNeyTrigramNll(scaled, "doc_id", "text").count()
    }
    timed("p84 contrastive_pairs") {
      Curation.contrastivePairs(scaled, "doc_id", "text",
        threshold = 0.12, shingleK = 3, numHashes = 32, bands = 16,
        buckets = 16, salt = 7).count()
    }
    timed("p92 lsh_audit_sampled") {
      Dedup.lshRecallAudit(scaled, "doc_id", "text",
        threshold = 0.12, shingleK = 3, numHashes = 32, bands = 16,
        sampleFraction = Some(0.25), maxDocFreq = Some(500)).count()
    }
    // the whole composed flow: quality floors → Gopher screen → fuzzy
    // decontamination → near-dup dedup → span surgery → split, at ×N —
    // the dedup stage collapses the replicas, so this is the flow's
    // maximal-duplication regime
    timed("p49 curate_e2e") {
      TrainingPipeline.curate(
        scaled.where(col("doc_id") % 50 =!= 0), "doc_id", "text",
        minQuality = 0.3, minWords = 20,
        blocklist = Some((scaled.where(col("doc_id") % 50 === 0), "doc_id", "text")))
        .count()
    }
    // the production sizing: the audit sample is ABSOLUTE (audit the
    // same number of docs however big the corpus is) — fraction scales
    // down with ×N, so the audit cost stays flat while the corpus grows
    timed("p92 lsh_audit_absolute") {
      Dedup.lshRecallAudit(scaled, "doc_id", "text",
        threshold = 0.12, shingleK = 3, numHashes = 32, bands = 16,
        sampleFraction = Some(0.25 / replicas), maxDocFreq = Some(500)).count()
    }
    spark.stop()
  }
}
