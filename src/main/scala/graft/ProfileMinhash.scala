package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  (n=$n)")
    }
    time("shingles only") {
      docs.select(Dedup.shingles(col("text"), 3).as("s")).selectExpr("sum(size(s))").head().getLong(0)
    }
    time("signature 32") {
      docs.select(Dedup.minhashSignature(Dedup.shingles(col("text"), 3), 32).as("sig"))
        .selectExpr("sum(size(sig))").head().getLong(0)
    }
    time("candidates") {
      Dedup.minhashCandidates(docs, "doc_id", "text", 3, 32, 16).count()
    }
    time("full neardups") {
      Dedup.minhashNearDups(docs, "doc_id", "text", 0.12, 3, 32, 16).count()
    }
    spark.stop()
  }
}
