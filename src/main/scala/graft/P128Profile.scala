package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, OperatorCache, Recrawl, TextSearch}

/** Job-count profile of the p128 recrawl-serving capstone, phase by
  * phase — the evidence base for job-count reduction work (r19 VERDICT
  * "Next #6": 156 latency-bound jobs at sf0.1). Prints one line per
  * phase: jobs started while that phase ran.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/run.sh graft.P128Profile
  */
object P128Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-p128-profile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val counts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var phase = "init"
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        counts.merge(phase, 1, (a, b) => a + b)
    })
    def in[A](name: String)(body: => A): A = {
      phase = name; val a = body; phase = "between"; a
    }
    import spark.implicits._
    val s = spark
    val docs = Tables.load(s, dir, "documents")
    val corpus = docs.where(pmod(col("doc_id"), lit(20)) =!= 0)
    val block = docs.where(pmod(col("doc_id"), lit(20)) === 0)
    val base = s"target/graft-tmp/recrawl_profile"
    val m10 = pmod(col("doc_id"), lit(10))
    val v1 = corpus.select(col("doc_id"),
      when(m10 === 3, concat(lit("draft placeholder "), col("doc_id")))
        .otherwise(col("text")).as("text"))
    val layouts = Recrawl.ServingLayouts(
      textIndex = Some(s"$base/bm25"),
      shingleIndex = Some(s"$base/shingles"))
    in("1_write_bm25") {
      TextSearch.writeIndex(v1, "doc_id", "text", s"$base/bm25") }
    in("2_write_shingles") {
      Dedup.writeShingleIndex(v1, "doc_id", "text", s"$base/shingles",
        shingleK = 8) }
    OperatorCache.releaseAll(s)
    val changed = corpus.where(m10 === 3 || m10 === 1)
      .select(col("doc_id"),
        when(m10 === 1, concat(lit("rewritten clean page "), col("doc_id")))
          .otherwise(col("text")).as("text"))
      .unionByName(corpus.where(m10 === 7)
        .select((col("doc_id") + 10000000L).as("doc_id"),
          concat(lit("fresh crawled page about join vector filter "),
            col("doc_id")).as("text")))
    if (sys.env.contains("P128_FINE")) {
      // sequential decomposition of advance: per-op job counts
      val batch = in("3a_mat_batch") {
        OperatorCache.materialize(changed.select(col("doc_id"), col("text"))) }
      val dels = in("3b_mat_dels") { OperatorCache.materialize(
        corpus.where(m10 === 5).select("doc_id")) }
      in("3c_bm25_delete") {
        TextSearch.deleteFromIndex(s, s"$base/bm25", dels, "doc_id") }
      in("3d_bm25_update") {
        TextSearch.updateIndex(batch, "doc_id", "text", s"$base/bm25") }
      in("3e_shingle_delete") {
        Dedup.deleteFromShingleIndex(s, s"$base/shingles", dels, "doc_id") }
      in("3f_shingle_update") {
        Dedup.updateShingleIndex(batch, "doc_id", "text", s"$base/shingles") }
      OperatorCache.release(batch); OperatorCache.release(dels)
    } else in("3_advance") {
      Recrawl.advance(s, changed,
        corpus.where(m10 === 5).select("doc_id"), "doc_id", "text", layouts) }
    OperatorCache.releaseAll(s)
    def probes(tag: String) = in(tag) {
      val bm = TextSearch.searchTopK(s, s"$base/bm25",
          Seq("join", "vector", "filter"), k = 10)
        .select(lit("bm25").as("family"), col("doc"),
          col("score").as("metric"))
      val de = Dedup.probeContamination(s, s"$base/shingles",
          block, "doc_id", "text", minOverlap = 3)
        .select(lit("decon").as("family"), col("doc"),
          col("n_overlap").cast("double").as("metric"))
      bm.unionByName(de).collect()
    }
    probes("4_probe_tombstoned")
    in("5_compact") { Recrawl.compact(s, layouts) }
    probes("6_probe_compacted")
    val total = counts.values().toArray.map(_.asInstanceOf[Integer].intValue).sum
    counts.forEach((k, v) => println(s"$k: $v"))
    println(s"TOTAL: $total")
    spark.stop()
  }
}
