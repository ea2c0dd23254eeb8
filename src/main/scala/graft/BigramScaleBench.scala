package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{OperatorCache, TextAnalysis}

/** Scale proof for the bigram-LM scorer (PLANS.md): replicate the sf0.1
  * documents corpus ×N with remapped ids and score every doc. The
  * interesting scale property: replication grows the DOC-grained frames
  * (tokens, bigrams, scores) ×N while the MODEL-grained frames
  * (pairTotals, leftTotals, vocab) stay fixed — the corpus vocabulary
  * doesn't change — so the model-first restructure's claim ("the big
  * frame joins once; the model side is vocabulary-bounded") is exactly
  * what a sublinear-in-N model cost demonstrates. Per-stage seconds via
  * the same onStage observer pattern as ClusterScaleBench.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/run.sh \
  *   graft.BigramScaleBench [replicas]
  */
object BigramScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicas = args.headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-bigram-scale")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val maxId = docs.agg(max("doc_id")).head().getLong(0) + 1L
    val scaled = docs
      .withColumn("copy", explode(sequence(lit(0), lit(replicas - 1))))
      .select((col("doc_id") + col("copy") * maxId).as("doc_id"), col("text"))
      .persist()
    val nDocs = scaled.count()

    val t0 = System.nanoTime()
    val stats = TextAnalysis.bigramNll(scaled, "doc_id", "text")
      .agg(count(lit(1)).as("docs_out"),
        sum("n_bigrams").as("bigrams"),
        round(avg("nll"), 4).as("avg_nll"))
      .head()
    val sec = (System.nanoTime() - t0) / 1e9
    OperatorCache.releaseAll(spark)

    println(s"""{"docs":$nDocs,"replicas":$replicas,""" +
      s""""bigram_sec":${f"$sec%.2f"},"docs_out":${stats.getLong(0)},""" +
      s""""bigrams":${stats.getLong(1)},"avg_nll":${stats.getDouble(2)}}""")
    spark.stop()
  }
}
