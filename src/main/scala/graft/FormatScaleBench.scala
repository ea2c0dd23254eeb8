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
  * Usage: tools/run.sh graft.FormatScaleBench [--only-mm] [docsDir] [shards]
  *   (defaults target/docs500k, 32; --only-mm runs just the composed
  *   multimodal-curate section)
  */
object FormatScaleBench {
  def main(args: Array[String]): Unit = {
    val (flags, rest) = args.partition(_.startsWith("--"))
    val onlyMm = flags.contains("--only-mm")
    val docsDir = rest.headOption.getOrElse("target/docs500k")
    val shards = rest.drop(1).headOption.map(_.toInt).getOrElse(32)
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
    if (!onlyMm) Seq(1, 2).foreach { round =>
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
    if (!onlyMm) time("warc indexed write") {
      Warc.writeShardsIndexed(docs, "doc_id", "text", idxDir, shards)
    }
    if (!onlyMm) Seq(100, 10000).foreach { k =>
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
    if (!onlyMm) {
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
    }

    // the composed multimodal curate loop (tar in → decode both
    // modalities → pHash ∩ audio-landmark dedup → components → curated
    // tar out) at 20–40× the oracle fixture. NOTE on the growth you see:
    // the fixture's geometry is 18 equivalence classes, so near-dup
    // PAIRS grow quadratically with n here — that is the fixture being
    // deliberately dup-saturated, not the operator (real corpora have
    // tiny clusters; the operator's joins are banded/landmark-keyed,
    // never all-pairs). The decode+hash stages — the part that dominates
    // at real dup rates — scale linearly and map-side.
    Seq(2000L, 4000L).foreach { n =>
      val ids = spark.range(n).select(col("id").as("doc_id"))
      val png = graft.pipeline.Multimodal.patternedAssets(spark, ids, "doc_id")
        .toDF().select(col("asset_id").as("id"), col("data").as("png"))
      val wav = graft.pipeline.Multimodal.toneAssets(spark, ids, "doc_id")
        .toDF().select(col("asset_id").as("id"), col("data").as("wav"))
      val input = png.join(wav, "id")
        .select(col("id").cast("string").as("key"), col("png"), col("wav"))
      val mmIn = s"target/graft-tmp/format_scale_mm_in_$n"
      val mmOut = s"target/graft-tmp/format_scale_mm_out_$n"
      def timeMm(label: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime()
        f
        val s = (System.nanoTime() - t0) / 1e9
        println(f"$label: $s%.1fs (${n / s}%.0f samples/s)")
      }
      timeMm(s"mm shards write n=$n") {
        WebDataset.writeShards(input, "key",
          Seq("png" -> col("png"), "wav" -> col("wav")), mmIn, shards)
      }
      timeMm(s"mm curate loop n=$n") {
        val kept = graft.pipeline.Multimodal.curateShards(spark, mmIn, mmOut)
          .count()
        require(kept == 18, s"fixture collapses to its 18 classes, got $kept")
      }
      graft.pipeline.OperatorCache.releaseAll(spark)
    }

    // the recrawl claim, measured HONESTLY: at this fixture's asset
    // size (KB-scale PNGs/WAVs) the whole loop is job-overhead-bound,
    // so incremental wall time ≈ full wall time — the structural saving
    // is BYTES TOUCHED, which is what dominates at real asset sizes
    // (MB-scale images, video): the incremental path reads the batch's
    // payloads plus the fingerprint state, never the prior corpus's
    // payload bytes. Both numbers are printed; the bytes ratio is the
    // one that scales.
    {
      val nPrior = 4000L
      val nBatch = 400L
      def assetsDf(from: Long, until: Long) = {
        val ids = spark.range(from, until).select(col("id").as("doc_id"))
        val png = graft.pipeline.Multimodal.patternedAssets(spark, ids, "doc_id")
          .toDF().select(col("asset_id").as("id"), col("data").as("png"))
        val wav = graft.pipeline.Multimodal.toneAssets(spark, ids, "doc_id")
          .toDF().select(col("asset_id").as("id"), col("data").as("wav"))
        png.join(wav, "id")
          .select(col("id").cast("string").as("key"), col("png"), col("wav"))
      }
      def t(label: String)(f: => Unit): Double = {
        val t0 = System.nanoTime(); f
        val s = (System.nanoTime() - t0) / 1e9
        println(f"$label: $s%.1fs"); s
      }
      val root = "target/graft-tmp/format_scale_mm_inc"
      WebDataset.writeShards(assetsDf(0, nPrior), "key",
        Seq("png" -> col("png"), "wav" -> col("wav")), s"$root/prior", shards)
      WebDataset.writeShards(assetsDf(nPrior, nPrior + nBatch), "key",
        Seq("png" -> col("png"), "wav" -> col("wav")), s"$root/batch", shards)
      WebDataset.writeShards(assetsDf(0, nPrior + nBatch), "key",
        Seq("png" -> col("png"), "wav" -> col("wav")), s"$root/all", shards)
      t(s"mm state write (prior=$nPrior)") {
        graft.pipeline.Multimodal.writeMmState(spark, s"$root/prior", s"$root/state")
      }
      val inc = t(s"mm incremental (batch=$nBatch vs state)") {
        graft.pipeline.Multimodal.curateShardsIncremental(
          spark, s"$root/state", s"$root/batch", s"$root/incout").count()
      }
      graft.pipeline.OperatorCache.releaseAll(spark)
      val full = t(s"mm full re-curate (corpus=${nPrior + nBatch})") {
        graft.pipeline.Multimodal.curateShards(
          spark, s"$root/all", s"$root/fullout").count()
      }
      graft.pipeline.OperatorCache.releaseAll(spark)
      def bytesOf(p: String): Long = {
        val f = new java.io.File(p)
        if (f.isFile) f.length
        else Option(f.listFiles).getOrElse(Array.empty).map(x => bytesOf(x.getPath)).sum
      }
      val priorB = bytesOf(s"$root/prior")
      val batchB = bytesOf(s"$root/batch")
      val stateB = bytesOf(s"$root/state")
      println(f"mm wall: incremental ${inc}%.1fs vs full $full%.1fs " +
        f"(overhead-bound at KB assets — see comment)")
      println(f"mm bytes touched: incremental ${(batchB + stateB) / 1e6}%.1f MB " +
        f"(batch ${batchB / 1e6}%.1f + state ${stateB / 1e6}%.1f) vs " +
        f"full ${(priorB + batchB) / 1e6}%.1f MB — state is " +
        f"${stateB * 100.0 / priorB}%.1f%% of the prior payload it replaces")
    }

    // Publish-path exchange accounting (r16, closing the r15 finding):
    // with MB-SCALE assets — where a redundant payload shuffle is
    // visible — compare the r15 publish shape (groupBy sample assembly,
    // then the writer re-shards: payload bytes cross the exchange
    // twice) against the r16 shape (shard-local assembly in the tar
    // scan; the kept join's single exchange IS the shard layout).
    // Broadcast disabled so the measured plan is the at-scale one (a
    // corpus-sized manifest does not fit on the driver); with broadcast
    // on, the new shape's payload shuffle drops to ZERO.
    {
      import spark.implicits._
      val n = 96
      val root = "target/graft-tmp/format_scale_mm_pub"
      // random payloads: shuffle writes are compressed, so constant
      // bytes would hide the exchange (a 1 MB repeat() shuffles as ~1 KB)
      val big = spark.range(n.toLong).as[Long].mapPartitions { it =>
        it.map { id =>
          val r = new java.util.Random(id)
          val png = new Array[Byte](1 << 20); r.nextBytes(png)
          val wav = new Array[Byte](1 << 18); r.nextBytes(wav)
          (id.toString, png, wav)
        }
      }.toDF("key", "png", "wav")
      WebDataset.writeShards(big, "key",
        Seq("png" -> col("png"), "wav" -> col("wav")), s"$root/in", 8)
      val manifest = spark.range(0, n.toLong, 2).select(col("id").as("doc"),
        col("id").as("cluster"), lit(1L).as("n_members"))
      val shuffleB = new java.util.concurrent.atomic.AtomicLong(0L)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) shuffleB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
      val totalPayload = n.toLong * ((1L << 20) + (1L << 18))
      def noBroadcast(f: => Unit): Unit = {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        try f finally {
          spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
          spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        }
      }
      def measure(label: String)(f: => Unit): Unit = {
        spark.sparkContext.addSparkListener(listener)
        shuffleB.set(0L)
        val t0 = System.nanoTime(); f
        val s = (System.nanoTime() - t0) / 1e9
        Thread.sleep(1000) // let the async listener bus drain
        spark.sparkContext.removeSparkListener(listener)
        println(f"$label: $s%.1fs, shuffle ${shuffleB.get / 1e6}%.1f MB = " +
          f"${shuffleB.get.toDouble / totalPayload}%.2fx the corpus payload " +
          f"(${totalPayload / 1e6}%.0f MB, half kept)")
      }
      def oldShape(out: String): Unit = {
        val samples = WebDataset.read(spark, s"$root/in/*.tar")
          .groupBy(col("key"))
          .agg(max(when(col("ext") === "png", col("payload"))).as("png"),
            max(when(col("ext") === "wav", col("payload"))).as("wav"))
        val kept = samples.join(
          manifest.select(col("doc").cast("string").as("key")), "key")
        WebDataset.writeShards(kept, "key",
          Seq("png" -> col("png"), "wav" -> col("wav")), out, 8)
      }
      def newShape(out: String): Unit = {
        val kept = graft.pipeline.Multimodal.publishKept(spark, s"$root/in", manifest)
        WebDataset.writeShards(kept, "key",
          Seq("png" -> col("png"), "wav" -> col("wav")), out, 8,
          preShuffled = true)
      }
      noBroadcast {
        measure("mm publish OLD shape, no broadcast (groupBy assembly + re-shard)") {
          oldShape(s"$root/old")
        }
        measure("mm publish NEW shape, no broadcast (join exchange IS the shard layout)") {
          newShape(s"$root/new")
        }
      }
      measure("mm publish NEW shape, manifest broadcasts (payloads never shuffle)") {
        newShape(s"$root/new_bc")
      }
    }

    // decontamination: persisted-postings probe vs the text-scan screen
    // on the same 500k corpus (the probe's saving = no re-tokenization)
    if (!onlyMm) {
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
    }
    spark.stop()
  }
}
