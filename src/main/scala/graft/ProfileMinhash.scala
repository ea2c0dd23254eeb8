package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** Stage-by-stage timing for the near-dup pipelines (minhash + simhash).
  * Usage: tools/run.sh graft.ProfileMinhash [sfDir] — defaults sf0.001.
  */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println(s"docs=${docs.count()} @ $dir")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  (n=$n)")
    }
    time("shingleRows") {
      Dedup.shingleRows(docs, "doc_id", "text", 3).count()
    }
    time("shingleRows distinct") {
      Dedup.shingleRows(docs, "doc_id", "text", 3).distinct().count()
    }
    time("seedHashes+minHashes") {
      Dedup.shingleRows(docs, "doc_id", "text", 3)
        .select(col("doc"), posexplode(
          transform(sequence(lit(0), lit(31)), s => xxhash64(col("shingle"), s))))
        .toDF("doc", "seed", "h")
        .groupBy("doc", "seed").agg(min("h")).count()
    }
    time("candidates") {
      Dedup.minhashCandidates(docs, "doc_id", "text", 3, 32, 16).count()
    }
    time("shingleSets") {
      Dedup.shingleSets(docs, "doc_id", "text", 3).count()
    }
    time("full neardups") {
      Dedup.minhashNearDups(docs, "doc_id", "text", 0.12, 3, 32, 16).count()
    }
    time("simhashPerDoc") {
      Dedup.simhashPerDoc(docs, "doc_id", "text").count()
    }
    time("simhash neardups") {
      Dedup.simhashNearDups(docs, "doc_id", "text", 3).count()
    }
    spark.stop()
  }
}
