package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Scale proof for winnowing (PLANS.md): replicate the sf0.1 documents
  * ×N with remapped ids and per-copy token suffixes (distinct content —
  * every replica fingerprints fresh), measure the fingerprint pass and
  * the overlap join separately.
  *
  * What must hold: fingerprinting is one doc-keyed exchange + window
  * arithmetic — linear in tokens with a flat per-doc constant; the
  * overlap join's cost tracks docs-per-fingerprint bucket sizes, which
  * the copy suffix keeps constant as N grows (fresh grams → fresh
  * fingerprints), so pair output stays ~N-proportional, not N².
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/run.sh \
  *   graft.WinnowScaleBench [replicas ...]   (default: 1 10 20)
  */
object WinnowScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 10, 20)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.memory.offHeap.enabled", "true")
      .config("spark.memory.offHeap.size", "24g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.load(spark, sfDir, "documents")
    val maxId = docs.agg(max("doc_id")).head().getLong(0) + 1L

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    sizes.foreach { n =>
      // suffix EVERY token with the copy index: a tail-only marker
      // would leave replicas sharing most grams (they would genuinely
      // near-dup each other and pair output would grow quadratically
      // per clone group); per-token suffixes make all grams fresh, so
      // the ×N corpus has ×N distinct content and ~×N pair structure
      val scaled = docs
        .withColumn("copy", explode(sequence(lit(0), lit(n - 1))))
        .select((col("doc_id") + col("copy") * maxId).as("doc_id"),
          regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1x"), col("copy"))).as("text"))
      val (nFp, fpSec) = time {
        Dedup.winnowFingerprints(scaled, "doc_id", "text").count()
      }
      val (nPairs, pairSec) = time {
        Dedup.winnowOverlapPairs(scaled, "doc_id", "text", minShared = 2).count()
      }
      println(f"""{"bench":"winnow_scale","replicas":$n,"docs":${maxId * n},""" +
        f""""fp_sec":$fpSec%.2f,"n_fps":$nFp,"pair_sec":$pairSec%.2f,"n_pairs":$nPairs}""")
    }
    spark.stop()
  }
}
