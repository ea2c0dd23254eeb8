package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.pipeline.Similarity

/** Scale proof for the ANN serving layout (PLANS.md "ANN serving at
  * scale"): replicate the sf embeddings corpus ×1/×10/×20 with remapped
  * ids, write each as a [[Similarity.writeIndexed]] bucket-partitioned
  * index, and measure [[Similarity.probeIndexed]] latency at each scale.
  * The claim under test: probe cost stays roughly FLAT while the corpus
  * grows 20× because the bucket predicate prunes to the same
  * `planes + 1` partition directories regardless of corpus size — the
  * property that lets one serving query touch MBs of a 10B-vector index.
  * Each probe plan is asserted to carry PartitionFilters on `bucket`
  * (no silent full scans). [[Similarity.sq8TopK]] runs over the same
  * corpora as the contrast: compressed full scan, expected to grow
  * linearly with the corpus.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/run.sh \
  *   graft.AnnScaleBench [replica-list, default "1,10,20"]
  */
object AnnScaleBench {

  private def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicaList = args.headOption.getOrElse("1,10,20").split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-ann-scale")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.load(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val query = emb.where(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
    val maxId = emb.agg(max("vec_id")).head().getLong(0) + 1L

    val results = replicaList.map { replicas =>
      val scaled =
        if (replicas == 1) emb
        else emb
          .withColumn("copy", explode(sequence(lit(0), lit(replicas - 1))))
          .select((col("vec_id") + col("copy") * maxId).as("vec_id"), col("embedding"))
      val nVecs = scaled.count()
      val path = s"target/graft-tmp/ann-scale/index_x$replicas"

      val (_, buildSec) = timed {
        Similarity.writeIndexed(scaled, "embedding", path, planes = 12)
      }

      def probe() = Similarity.probeIndexed(
        spark, path, "vec_id", "embedding", query, k = 10, planes = 12)

      // the serving guarantee: the scan must prune on the bucket predicate
      val plan = probe().queryExecution.explainString(ExplainMode.fromString("formatted"))
      require(plan.contains("PartitionFilters") && plan.contains("bucket"),
        s"probe plan at x$replicas lost its PartitionFilters:\n$plan")

      // cold run includes planning + file listing; then median of 5 warm runs
      val (_, coldSec) = timed(probe().collect())
      val warm = (1 to 5).map(_ => timed(probe().collect())._2).sorted
      val probeSec = warm(warm.size / 2)

      val sq8Corpus = spark.read.parquet(path).select(col("vec_id"), col("embedding"))
      val (_, sq8Sec) = timed(
        Similarity.sq8TopK(sq8Corpus, "vec_id", "embedding", query, k = 10).collect())

      println(f"""{"replicas":$replicas,"vectors":$nVecs,"build_sec":$buildSec%.2f,""" +
        f""""probe_cold_sec":$coldSec%.2f,"probe_warm_sec":$probeSec%.3f,"sq8_scan_sec":$sq8Sec%.2f}""")
      (replicas, nVecs, buildSec, coldSec, probeSec, sq8Sec)
    }

    val base = results.head._5
    val last = results.last._5
    println(f"""{"probe_warm_growth_x${results.last._1}":${last / base}%.2f}""")
    spark.stop()
  }
}
