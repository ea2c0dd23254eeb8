package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch measurement main (r21): quantify the 1-task-scan penalty on
  * tokenize-heavy aggregates. Not part of the bench contract. */
object SpreadProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs.write.format("noop").mode("overwrite").save()
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$tag%-28s ${(System.nanoTime()-t0)/1e9}%6.2f s")
    }
    def tf(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id").as("doc"), explode(graft.pipeline.Dedup.tokensOf(col("text"))).as("term"))
      .groupBy("doc", "term").agg(count(lit(1)).as("tf"))
    graft.functions.GraftFunctions.ensureRegistered(spark)
    for (i <- 1 to 3) {
      time(s"tf 1-task scan      run$i") { tf(docs).write.format("noop").mode("overwrite").save() }
      time(s"tf repartition(32)  run$i") { tf(docs.repartition(32)).write.format("noop").mode("overwrite").save() }
    }
    println("scan partitions: " + docs.rdd.getNumPartitions)
    spark.stop()
  }
}
