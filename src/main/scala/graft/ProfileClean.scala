package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, TextAnalysis}

/** Stage-by-stage timing for the cleanCorpus pipeline (p15).
  * Usage: SPARK_GRAFT_CPUS=32 tools/run.sh graft.ProfileClean [sfDir]
  */
object ProfileClean {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, dir, "documents")
    docs.write.format("noop").mode("overwrite").save() // warmup

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    time("scored+filter (noop)") {
      docs.withColumn("quality", TextAnalysis.qualityScore(col("text")))
        .withColumn("lang_pred", TextAnalysis.languageId(col("text")))
        .where(col("quality") >= 0.2 && col("lang_pred").isin("en", "und"))
        .write.format("noop").mode("overwrite").save()
    }
    val filtered = docs.withColumn("quality", TextAnalysis.qualityScore(col("text")))
      .withColumn("lang_pred", TextAnalysis.languageId(col("text")))
      .where(col("quality") >= 0.2 && col("lang_pred").isin("en", "und"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("filtered materialize") { filtered.count(); () }
    var pairs: org.apache.spark.sql.DataFrame = null
    time("minhash pairs") {
      pairs = Dedup.minhashNearDups(filtered, "doc_id", "text", threshold = 0.5)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      pairs.count(); ()
    }
    var clusters: org.apache.spark.sql.DataFrame = null
    time("clusters") {
      clusters = Dedup.nearDupClusters(pairs); clusters.count(); ()
    }
    time("anti-join output (noop)") {
      val dropped = clusters.where(col("doc") =!= col("label"))
        .select(col("doc").as("__drop"))
      filtered.join(dropped, col("doc_id") === col("__drop"), "left_anti")
        .write.format("noop").mode("overwrite").save()
    }
    time("full cleanCorpus again") {
      TextAnalysis.cleanCorpus(docs, "doc_id", "text",
        minQuality = 0.2, languages = Set("en", "und"), dedupThreshold = 0.5)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
