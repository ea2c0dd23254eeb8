package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Curation

/** Scale proof for sliding-window chunking (PLANS.md): replicate the
  * sf0.1 documents corpus ×N with remapped ids, chunk into 16-token
  * windows at stride 8, and report wall time + chunk stats. The plan is
  * one scan + one Generate (map-only, zero shuffles), so cost must
  * scale ~linearly in rows with no fixed-cost cliff — the count() that
  * materializes the chunks IS the whole pipeline.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/run.sh \
  *   graft.ChunkScaleBench [replicas]
  */
object ChunkScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicas = args.headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-chunk-scale")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val maxId = docs.agg(max("doc_id")).head().getLong(0) + 1L
    val scaled = docs
      .withColumn("copy", explode(sequence(lit(0), lit(replicas - 1))))
      .select((col("doc_id") + col("copy") * maxId).as("doc_id"), col("text"))
      // persist + count OUTSIDE the timed section (the PackScaleBench
      // lesson): the timed pass must measure chunking, not corpus
      // construction
      .persist()
    val nDocs = scaled.count()

    val t0 = System.nanoTime()
    val stats = Curation.chunkDocuments(scaled, "doc_id", "text", 16, 8)
      .agg(count(lit(1)).as("n_chunks"), avg("n_tokens").as("mean_tokens"))
      .head()
    val sec = (System.nanoTime() - t0) / 1e9

    println(s"""{"docs":$nDocs,"replicas":$replicas,""" +
      s""""chunk_sec":${f"$sec%.2f"},"chunks":${stats.getLong(0)},""" +
      s""""mean_tokens":${f"${stats.getDouble(1)}%.2f"}}""")
    spark.stop()
  }
}
