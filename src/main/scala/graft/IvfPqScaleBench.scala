package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Similarity

/** Scale proof for the IVF-PQ serving layout (PLANS.md): replicate the
  * sf embeddings ×N with remapped ids, write each as a
  * [[Similarity.writeIvfPq]] centroid-partitioned stored-code index,
  * and measure [[Similarity.probeIvfPq]] latency at each scale. The
  * claim under test: a probe reads only the nprobe pruned partitions
  * and scores STORED m-int codes (no re-encoding), so probe cost grows
  * with the probed cells' population (~nprobe/k of the corpus), not
  * with index build size — and each probed row costs m table lookups,
  * not dim multiplies; full vectors are touched only for the
  * k·rescoreFactor rescore rows. Every probe plan is asserted to carry
  * PartitionFilters on `centroid`.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/run.sh \
  *   graft.IvfPqScaleBench [replica-list, default "1,10,20"]
  */
object IvfPqScaleBench {

  private def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicaList = args.headOption.getOrElse("1,10,20").split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-ivfpq-scale")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.load(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val query = emb.where(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
    val maxId = emb.agg(max("vec_id")).head().getLong(0) + 1L
    // model artifacts trained ONCE on the base corpus (replication would
    // not change the distribution, only the counts) — at real scale the
    // coarse/PQ models are trained on a sample for the same reason
    val coarse = Similarity.ivfTrain(emb, "vec_id", "embedding", k = 8)
    val books = Similarity.trainPq(emb, "vec_id", "embedding", m = 8, k = 16)
    val resBooks = Similarity.trainPqResidual(emb, "vec_id", "embedding",
      coarse, m = 8, k = 16)

    val results = replicaList.map { replicas =>
      val scaled =
        if (replicas == 1) emb
        else emb
          .withColumn("copy", explode(sequence(lit(0), lit(replicas - 1))))
          .select((col("vec_id") + col("copy") * maxId).as("vec_id"), col("embedding"))
      val nVecs = scaled.count()
      val path = s"target/graft-tmp/ivfpq-scale/index_x$replicas"

      val (_, buildSec) = timed {
        Similarity.writeIvfPq(scaled, "embedding", path, coarse, books)
      }
      // min-of-two probes (the second is page-cache warm, like serving)
      def probe(): Double = timed {
        Similarity.probeIvfPq(spark, path, "vec_id", "embedding",
          coarse, books, query, k = 10, nprobe = 3).collect()
      }._2
      val probeSec = math.min(probe(), probe())
      val plan = Similarity.probeIvfPq(spark, path, "vec_id", "embedding",
        coarse, books, query, k = 10, nprobe = 3)
        .queryExecution.executedPlan.toString
      require(plan.contains("PartitionFilters: [centroid"),
        s"probe plan must prune centroid partitions:\n${plan.take(400)}")

      // residual layout: same pruning, stored residual codes, one extra
      // driver constant per probed cell — probe cost must track the raw
      // layout's
      val resPath = s"target/graft-tmp/ivfpq-scale/res_index_x$replicas"
      val (_, resBuildSec) = timed {
        Similarity.writeIvfPqResidual(scaled, "embedding", resPath, coarse, resBooks)
      }
      def probeRes(): Double = timed {
        Similarity.probeIvfPqResidual(spark, resPath, "vec_id", "embedding",
          coarse, resBooks, query, k = 10, nprobe = 3).collect()
      }._2
      val resProbeSec = math.min(probeRes(), probeRes())

      // workload serving: W queries through the per-query loop vs ONE
      // probeIvfPqBatch pass (both against the page-cache-warm raw
      // layout — the partitions were just probed above). The batch's
      // claim: wall grows with the UNION of probed cells, not with W,
      // while the loop pays W job round trips.
      val W = 64
      val qvecs = emb.where(col("vec_id") < W)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val queriesW = qvecs.collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq
      val (batchRows, batchSec) = timed {
        Similarity.probeIvfPqBatch(qvecs, "qid", "qv", path,
          "vec_id", "embedding", coarse, books, k = 10, nprobe = 3).collect()
      }
      val (loopRows, loopSec) = timed {
        queriesW.map { case (_, q) =>
          Similarity.probeIvfPq(spark, path, "vec_id", "embedding",
            coarse, books, q, k = 10, nprobe = 3).collect()
        }
      }
      require(batchRows.length == loopRows.map(_.length).sum,
        s"batch and loop must return the same row count at x$replicas")
      (replicas, nVecs, buildSec, probeSec, resBuildSec, resProbeSec,
        batchSec, loopSec)
    }

    results.foreach { case (r, n, b, p, rb, rp, bs, ls) =>
      println(s"""{"replicas":$r,"vectors":$n,""" +
        s""""build_sec":${f"$b%.2f"},"probe_sec":${f"$p%.2f"},""" +
        s""""res_build_sec":${f"$rb%.2f"},"res_probe_sec":${f"$rp%.2f"},""" +
        s""""batch64_sec":${f"$bs%.2f"},"loop64_sec":${f"$ls%.2f"}}""")
    }

    // LSH batched serving at a BULK workload (r18 VERDICT): 1e5 queries
    // against the largest replica's LSH layout, once per regime. The
    // claim under test: the bucket-union probe collects at most cap+1
    // longs regardless of workload size, and above the cap the join
    // regime serves the same workload with ZERO driver enumeration —
    // so a 1e5–1e6-query offline scoring pass cannot OOM the driver.
    val maxReplicas = replicaList.max
    val scaledMax =
      if (maxReplicas == 1) emb
      else emb
        .withColumn("copy", explode(sequence(lit(0), lit(maxReplicas - 1))))
        .select((col("vec_id") + col("copy") * maxId).as("vec_id"), col("embedding"))
    val nMax = scaledMax.count()
    val lshPath = "target/graft-tmp/ivfpq-scale/lsh_bulk"
    val planes = Similarity.planesFor(nMax)
    val (_, lshBuildSec) = timed {
      Similarity.writeIndexed(scaledMax, "embedding", lshPath, planes)
    }
    val bigW = args.lift(1).map(_.trim.toInt).getOrElse(100000)
    val wReplicas = math.max(1, math.ceil(bigW.toDouble / nMax).toInt)
    val bulk = (if (wReplicas == 1) scaledMax
      else scaledMax
        .withColumn("copy", explode(sequence(lit(0), lit(wReplicas - 1))))
        .select((col("vec_id") + col("copy") * maxId * maxReplicas).as("vec_id"),
          col("embedding")))
      .limit(bigW)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    // count(), not collect(): 1e5×k result rows stay distributed
    def lshServe(cap: Int): (Long, Double) = timed {
      Similarity.probeIndexedBatch(bulk, "qid", "qv", lshPath,
        "vec_id", "embedding", k = 10, planes,
        maxPrunedBuckets = cap).count()
    }
    val (prunedRows, prunedSec) = lshServe(100000) // default cap: isin regime
    val (joinRows, joinSec) = lshServe(1) // forced join regime: no enumeration
    require(prunedRows == joinRows,
      s"regimes must serve identical workloads: $prunedRows vs $joinRows")
    println(s"""{"lsh_bulk":true,"vectors":$nMax,"planes":$planes,""" +
      s""""workload":$bigW,"build_sec":${f"$lshBuildSec%.2f"},""" +
      s""""result_rows":$prunedRows,""" +
      s""""pruned_serve_sec":${f"$prunedSec%.2f"},""" +
      s""""join_serve_sec":${f"$joinSec%.2f"}}""")

    // THIRD regime at bulk scale (r19 VERDICT item 2): a small-bucket
    // layout (planes=12 → 4096 buckets, ALWAYS under the prune cap)
    // serving the same bulk workload. Before the regime split this
    // combination BROADCAST the full workload×13 probe frame (each row
    // carrying the query vector — gigabytes at 10⁶ queries, a job
    // abort); now the workload-size probe routes it to the shuffle
    // join while keeping the isin partition prune, so it completes at
    // any workload size. The plan is asserted broadcast-free.
    val lshSmallPath = "target/graft-tmp/ivfpq-scale/lsh_bulk_p12"
    val (_, smallBuildSec) = timed {
      Similarity.writeIndexed(scaledMax, "embedding", lshSmallPath, 12)
    }
    val bulkServe = Similarity.probeIndexedBatch(bulk, "qid", "qv",
      lshSmallPath, "vec_id", "embedding", k = 10, planes = 12)
    val bulkPlan = bulkServe.queryExecution.executedPlan.toString
    require(!bulkPlan.contains("BroadcastHashJoin"),
      s"bulk workload must not broadcast the probe frame:\n${bulkPlan.take(400)}")
    require("PartitionFilters: \\[bucket".r.findFirstIn(bulkPlan).isDefined,
      s"small-bucket layout must keep the isin prune:\n${bulkPlan.take(400)}")
    val (p12Rows, p12Sec) = timed { bulkServe.count() }
    println(s"""{"lsh_bulk_pruned_shuffle":true,"vectors":$nMax,"planes":12,""" +
      s""""workload":$bigW,"build_sec":${f"$smallBuildSec%.2f"},""" +
      s""""result_rows":$p12Rows,"serve_sec":${f"$p12Sec%.2f"}}""")
    spark.stop()
  }
}
