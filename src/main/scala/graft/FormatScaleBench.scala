package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.{Warc, WebDataset}

/** Throughput check for the archive-format sources at corpus scale:
  * write a 500k-doc corpus as sharded `.warc.gz` and WebDataset `.tar`,
  * read each back, and report per-format wall clock + payload MB/s.
  * The interesting property is the SHAPE, not the absolute number:
  * both reads are embarrassingly file-parallel (shards × one sequential
  * walk, no shuffle), so throughput scales with cores/executors and the
  * per-task memory bound is one compressed shard — the 100 TB posture
  * is "more shards, same plan".
  *
  * Usage: tools/run.sh graft.FormatScaleBench [docsDir] [shards]
  *   (defaults target/docs500k, 32)
  */
object FormatScaleBench {
  def main(args: Array[String]): Unit = {
    val docsDir = args.headOption.getOrElse("target/docs500k")
    val shards = args.drop(1).headOption.map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("graft-format-scale")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$docsDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val nDocs = docs.count()
    val payloadMb = docs.agg(sum(length(col("text")))).head().getLong(0) / 1e6
    println(f"corpus: $nDocs docs, $payloadMb%.0f MB text, $shards shards")

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label: $s%.1fs (${payloadMb / s}%.0f MB/s)")
    }

    val warcDir = "target/graft-tmp/format_scale_warc"
    val wdsDir = "target/graft-tmp/format_scale_wds"
    val idxDir = "target/graft-tmp/format_scale_warc_idx"
    Seq(1, 2).foreach { round =>
      time(s"warc write round $round") {
        Warc.writeShards(docs, "doc_id", "text", warcDir, shards)
      }
      time(s"warc read  round $round") {
        val got = Warc.read(spark, warcDir)
          .where(col("warc_type") === "response")
          .agg(count(lit(1)), sum(length(col("payload")))).head()
        require(got.getLong(0) == nDocs, s"lost records: ${got.getLong(0)}")
      }
      time(s"wds  write round $round") {
        WebDataset.writeShards(docs, "doc_id",
          Seq("txt" -> col("text"),
            "json" -> to_json(struct(col("lang"), col("source")))),
          wdsDir, shards)
      }
      time(s"wds  read  round $round") {
        val got = WebDataset.read(spark, wdsDir)
          .where(col("ext") === "txt")
          .agg(count(lit(1)), sum(length(col("payload")))).head()
        require(got.getLong(0) == nDocs, s"lost members: ${got.getLong(0)}")
      }
    }

    // the random-access story: fetching k records must cost ~k range
    // reads + the index scan, NOT a shard scan — compare against the
    // full read above
    time("warc indexed write") {
      Warc.writeShardsIndexed(docs, "doc_id", "text", idxDir, shards)
    }
    Seq(100, 10000).foreach { k =>
      val wanted = docs.select(col("doc_id").cast("string").as("id"))
        .where(pmod(col("doc_id"), lit(nDocs / k)) === 0)
      Seq(1, 2).foreach { round =>
        time(f"warc fetch k≈$k%-6d round $round") {
          val n = Warc.fetch(spark, idxDir, wanted).count()
          require(n >= k / 2, s"fetched only $n of ~$k")
        }
      }
    }

    // the property that matters: fetch cost is independent of ARCHIVE
    // size — scale the archive 4×, the scan grows, the fetch doesn't
    val big = docs.crossJoin(spark.range(4).select(col("id").as("rep")))
      .select((col("doc_id") * 4 + col("rep")).as("doc_id"), col("text"))
    val bigDir = "target/graft-tmp/format_scale_warc_big"
    time("warc indexed write x4 archive") {
      Warc.writeShardsIndexed(big, "doc_id", "text", bigDir, shards)
    }
    val wanted100 = big.select(col("doc_id").cast("string").as("id"))
      .where(pmod(col("doc_id"), lit(4L * nDocs / 100)) === 0)
    Seq(1, 2).foreach { round =>
      time(s"warc full scan  x4 archive round $round") {
        Warc.read(spark, bigDir + "/*.warc.gz")
          .where(col("warc_type") === "response").count()
      }
      time(s"warc fetch k≈100 x4 archive round $round") {
        require(Warc.fetch(spark, bigDir, wanted100).count() >= 50)
      }
    }

    // decontamination: persisted-postings probe vs the text-scan screen
    // on the same 500k corpus (the probe's saving = no re-tokenization)
    val shIdx = "target/graft-tmp/format_scale_shidx"
    val block = docs.where(pmod(col("doc_id"), lit(5000L)) === 0) // 100 docs
    time("shingle index write (500k docs, k=8)") {
      graft.pipeline.Dedup.writeShingleIndex(
        docs, "doc_id", "text", shIdx, shingleK = 8, buckets = 64)
    }
    Seq(1, 2).foreach { round =>
      time(s"probe decontaminate round $round") {
        graft.pipeline.Dedup.probeContamination(
          spark, shIdx, block, "doc_id", "text", minOverlap = 3).count()
      }
      time(s"scan  decontaminate round $round") {
        graft.pipeline.Dedup.decontaminate(docs, "doc_id", "text",
          block, "doc_id", "text", shingleK = 8, minOverlap = 3).count()
      }
    }
    spark.stop()
  }
}
