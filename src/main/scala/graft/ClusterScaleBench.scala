package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** One-off scale proof for the iterative cluster loop (PLANS.md
  * "cluster loop at scale"): replicate the sf0.1 documents corpus ×N
  * (default 10 ≈ sf1 volume) with remapped ids, run the full
  * minhash-LSH → nearDupClusters pipeline, and report per-iteration
  * wall time + convergence round count. Replicas keep identical text,
  * so every original doc gains N−1 exact twins — the worst realistic
  * dedup shape (re-crawled shards), which multiplies candidate pairs
  * quadratically in N within each twin group.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/run.sh \
  *   graft.ClusterScaleBench [replicas]
  */
object ClusterScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicas = args.headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-cluster-scale")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val maxId = docs.agg(max("doc_id")).head().getLong(0) + 1L
    val scaled = docs
      .withColumn("copy", explode(sequence(lit(0), lit(replicas - 1))))
      .select((col("doc_id") + col("copy") * maxId).as("doc_id"), col("text"))
    val nDocs = scaled.count()

    val tPairs0 = System.nanoTime()
    val pairs = Dedup.minhashNearDups(scaled, "doc_id", "text",
      threshold = 0.12, shingleK = 3, numHashes = 32, bands = 16)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nPairs = pairs.count()
    val pairsSec = (System.nanoTime() - tPairs0) / 1e9

    val iters = scala.collection.mutable.Buffer.empty[(Int, Double)]
    val tCluster0 = System.nanoTime()
    // driverMaxEdges = 0: this bench PROVES the distributed loop's
    // per-iteration constant, so the small-edge driver cutover is
    // disabled regardless of replica count
    val labels = Dedup.nearDupClusters(pairs, maxIter = 10,
      onIteration = (round, sec) => iters += ((round, sec)),
      driverMaxEdges = 0L)
    val nClusters = labels.select("label").distinct().count()
    val clusterSec = (System.nanoTime() - tCluster0) / 1e9

    println(s"""{"docs":$nDocs,"replicas":$replicas,"pairs":$nPairs,""" +
      s""""pairs_sec":${f"$pairsSec%.2f"},"cluster_sec":${f"$clusterSec%.2f"},""" +
      s""""clusters":$nClusters,"iterations":${iters.size},""" +
      s""""iter_secs":[${iters.map(t => f"${t._2}%.2f").mkString(",")}]}""")
    spark.stop()
  }
}
