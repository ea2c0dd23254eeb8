package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Multimodal

/** Scale proof for the multimodal dedup trio (PLANS.md): generate ×N
  * asset tables (ids fanned out so every asset's payload is distinct —
  * fresh jitter positions, fresh phases) and measure decode+hash+match
  * wall time per modality.
  *
  * What must hold at scale, and what this measures:
  *  - decode+hash is MAP-SIDE: payload bytes (12 KB PNG / 3 KB WAV /
  *    ~37 KB DIB-AVI per asset) never enter an exchange — the only shuffled
  *    rows are fingerprints (16 B) and landmarks (20 B). So wall time
  *    grows linearly in assets with a flat per-asset constant, and the
  *    match join's cost tracks the CANDIDATE count, not the corpus.
  *  - the banded Hamming join stays bounded by docs-per-(frame,band)
  *    bucket exactly like the text simhash path.
  *
  * Usage: tools/run.sh graft.MultimodalScaleBench [assetsPerMode ...]
  *   (defaults: 108 1080 5400)
  */
object MultimodalScaleBench {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(108, 1080, 5400)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-multimodal-scale")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // Phase 1 — decode+hash throughput (the linear-scaling claim): the
    // fixture classes repeat, so pair OUTPUT would grow quadratically in
    // class size (they genuinely are all near-dups); fingerprinting cost
    // must not care. Matching is timed separately at the smallest n,
    // where cluster sizes resemble a deduped corpus.
    sizes.foreach { n =>
      // spread ids across partitions so decode parallelizes like a real
      // asset table (one id range per task, 32 tasks)
      val ids = spark.range(0, n, 1, 32).toDF("doc_id")
      val (imgFp, imgSec) = time {
        Multimodal.imagePhashes(spark,
          Multimodal.patternedAssets(spark, ids, "doc_id")).count()
      }
      val (audLm, audSec) = time {
        Multimodal.audioPeaks(spark,
          Multimodal.toneAssets(spark, ids, "doc_id")).count()
      }
      val (vidFp, vidSec) = time {
        Multimodal.videoFrameHashes(spark,
          Multimodal.videoAssets(spark, ids, "doc_id")).count()
      }
      println(f"""{"bench":"multimodal_hash","assets":$n,""" +
        f""""image_sec":$imgSec%.2f,"image_fps":$imgFp,""" +
        f""""audio_sec":$audSec%.2f,"audio_landmarks":$audLm,""" +
        f""""video_sec":$vidSec%.2f,"video_fps":$vidFp}""")
    }

    // Phase 2 — end-to-end match at the base size
    val base = spark.range(0, sizes.head.toLong, 1, 32).toDF("doc_id")
    val (imgPairs, imgAll) = time {
      Multimodal.imageNearDups(spark,
        Multimodal.patternedAssets(spark, base, "doc_id"), maxHamming = 4).count()
    }
    val (audPairs, audAll) = time {
      Multimodal.audioMatches(spark,
        Multimodal.toneAssets(spark, base, "doc_id"), minFrames = 5).count()
    }
    val (vidPairs, vidAll) = time {
      Multimodal.videoNearDups(spark,
        Multimodal.videoAssets(spark, base, "doc_id")).count()
    }
    println(f"""{"bench":"multimodal_match","assets":${sizes.head},""" +
      f""""image_sec":$imgAll%.2f,"image_pairs":$imgPairs,""" +
      f""""audio_sec":$audAll%.2f,"audio_pairs":$audPairs,""" +
      f""""video_sec":$vidAll%.2f,"video_pairs":$vidPairs}""")
    spark.stop()
  }
}
