package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, OperatorCache, Recrawl, TextSearch}

/** Measures the serving-layout lifecycle claims at corpus scale: that
  * applying a crawl delta through [[graft.pipeline.Recrawl.advance]]
  * costs BATCH work while the stateless alternative (rebuild both
  * layouts from the final corpus) costs CORPUS work — and that serving
  * with tombstones pending adds ~nothing to probe latency. Compaction
  * is timed separately: it IS corpus-priced (a full rewrite), which is
  * why it runs on a cadence, not per batch.
  *
  * Asserts tombstoned serving ≡ compacted serving ≡ rebuild serving on
  * both layouts before printing timings (a speedup over a wrong answer
  * is not a result).
  *
  * Usage: tools/run.sh graft.LifecycleScaleBench [sfDir] [deltaPct]
  *   sfDir defaults to target/docs500k (build with tools/make_docs.py);
  *   deltaPct is the changed slice in percent (deletions same size).
  */
object LifecycleScaleBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/docs500k")
    val deltaPct = args.lift(1).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.load(spark, dir, "documents").select("doc_id", "text")
    val n = docs.count()
    val m = pmod(col("doc_id"), lit(100L))
    val changedGate = m < lit(deltaPct.toLong)            // ~deltaPct% changed
    val deletedGate = m >= lit(deltaPct.toLong) && m < lit(2L * deltaPct) // ~deltaPct% deleted
    // v1 holds the pre-recrawl content for the changed slice
    val v1 = docs.select(col("doc_id"),
      when(changedGate, concat(lit("stale draft revision "), col("doc_id")))
        .otherwise(col("text")).as("text"))
    val changed = docs.where(changedGate)
      .select(col("doc_id"),
        concat(col("text"), lit(" recrawled revision tokens")).as("text"))
    val deleted = docs.where(deletedGate).select("doc_id")
    val finalCorpus = docs.where(!deletedGate)
      .select(col("doc_id"),
        when(changedGate, concat(col("text"), lit(" recrawled revision tokens")))
          .otherwise(col("text")).as("text"))
    // benchmark-sized blocklist for the decontamination probe
    val block = docs.where(pmod(col("doc_id"), lit(997L)) === 0)

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val base = "target/graft-tmp/lifecycle-bench"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val layouts = Recrawl.ServingLayouts(
      textIndex = Some(s"$base/bm25"),
      shingleIndex = Some(s"$base/shingles"))

    val (_, buildSec) = timed {
      TextSearch.writeIndex(v1, "doc_id", "text", s"$base/bm25")
      Dedup.writeShingleIndex(v1, "doc_id", "text", s"$base/shingles")
      OperatorCache.releaseAll(spark)
    }
    val (_, advanceSec) = timed {
      Recrawl.advance(spark, changed, deleted, "doc_id", "text", layouts)
      OperatorCache.releaseAll(spark)
    }
    // the stateless alternative: rebuild both layouts from the final corpus
    val (_, rebuildSec) = timed {
      TextSearch.writeIndex(finalCorpus, "doc_id", "text", s"$base/bm25_rb")
      Dedup.writeShingleIndex(finalCorpus, "doc_id", "text", s"$base/shingles_rb")
      OperatorCache.releaseAll(spark)
    }

    def serve(bm: String, sh: String)
        : ((Seq[(Long, Double, Long)], Set[Long]), (Double, Double)) = {
      val (ranked, bmSec) = timed(TextSearch.searchTopK(spark, bm,
          Seq("join", "vector", "filter"), k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq)
      val (flagged, deSec) = timed(Dedup.probeContamination(spark, sh, block,
          "doc_id", "text", minOverlap = 3)
        .select("doc").collect().map(_.getLong(0)).toSet)
      OperatorCache.releaseAll(spark)
      ((ranked, flagged), (bmSec, deSec))
    }
    val (tombstoned, probeTombSec) = serve(s"$base/bm25", s"$base/shingles")
    val (_, compactSec) = timed(Recrawl.compact(spark, layouts))
    val (compacted, probeCompSec) = serve(s"$base/bm25", s"$base/shingles")
    val (rebuilt, probeRbSec) = serve(s"$base/bm25_rb", s"$base/shingles_rb")

    require(tombstoned == rebuilt,
      s"tombstoned serving != rebuild: bm25 ${tombstoned._1.take(3)} vs " +
        s"${rebuilt._1.take(3)}; decon sizes ${tombstoned._2.size} vs ${rebuilt._2.size}")
    require(compacted == rebuilt, "compacted serving != rebuild")

    println(f"corpus $n%,d docs, delta = $deltaPct%% changed + $deltaPct%% deleted")
    println(f"build v1 (both layouts, once):   $buildSec%8.2f s")
    println(f"ADVANCE (the per-batch op):      $advanceSec%8.2f s")
    println(f"rebuild (stateless alternative): $rebuildSec%8.2f s   -> x${rebuildSec / advanceSec}%.2f per batch")
    println(f"compact (the cadence op):        $compactSec%8.2f s")
    // the pruned BM25 probe (3 term buckets) barely sees its tombstone
    // anti-join; the decon probe scans every bucket (this blocklist's
    // shingles hash everywhere), so pending tombstones cost it one
    // broadcast anti-join over the whole postings scan — the serving
    // tax compaction exists to remove
    println(f"serve bm25  tombstoned / compacted / rebuilt: ${probeTombSec._1}%.2f / ${probeCompSec._1}%.2f / ${probeRbSec._1}%.2f s")
    println(f"serve decon tombstoned / compacted / rebuilt: ${probeTombSec._2}%.2f / ${probeCompSec._2}%.2f / ${probeRbSec._2}%.2f s")
    println(f"flagged ${rebuilt._2.size}%,d docs; bm25 top ${rebuilt._1.size} identical across phases")
    spark.stop()
  }
}
