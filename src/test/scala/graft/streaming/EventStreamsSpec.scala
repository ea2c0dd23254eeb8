package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  test("windowedStats on a batch frame matches a plain groupBy") {
    val events = Tables.load(spark, sf, "events")
    val out = EventStreams.windowedStats(events, "1 hour")
    val expected = events
      .groupBy(date_trunc("hour", col("ts")).as("ws"), col("event_type"))
      .count()
    assert(out.count() == expected.count())
    assert(out.columns.contains("approx_users"))
  }

  test("windowedStats runs incrementally over a MemoryStream with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String, Double)]
    val df = mem.toDF().toDF("ts", "user_id", "event_type", "value")
    val agg = EventStreams.windowedStats(df, "1 hour", "10 minutes")
    assert(agg.isStreaming)
    val q = agg.writeStream.format("memory").queryName("win_test")
      .outputMode("update").start()
    try {
      mem.addData(
        (Timestamp.valueOf("2024-01-01 00:05:00"), 1L, "click", 1.0),
        (Timestamp.valueOf("2024-01-01 00:45:00"), 2L, "click", 2.0),
        (Timestamp.valueOf("2024-01-01 01:05:00"), 1L, "view", 3.0))
      q.processAllAvailable()
      val rows = spark.table("win_test").collect()
      assert(rows.length == 2) // (00:00 click), (01:00 view)
      val click = rows.find(_.getAs[String]("event_type") == "click").get
      assert(click.getAs[Long]("n_events") == 2)
      assert(click.getAs[Double]("sum_value") == 3.0)
    } finally q.stop()
  }

  test("streamFromDirectory: file-source stream over parquet matches batch counts") {
    // copy a small slice to a writable dir (file stream needs a listing dir)
    val dir = "/root/repo/target/graft-tmp/stream-src"
    Tables.load(spark, sf, "events").limit(200)
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val agg = EventStreams.streamFromDirectory(spark, dir)
    assert(agg.isStreaming)
    val q = agg.writeStream.format("memory").queryName("dir_stream")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("dir_stream")
        .agg(sum("n_events")).head().getLong(0)
      assert(streamed == 200)
    } finally q.stop()
  }

  test("funnelStream: step state carries ACROSS micro-batches, order enforced") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Long)]
    val df = mem.toDF().toDF("user_id", "ts", "event_type", "event_id")
    val out = EventStreams.funnelStream(spark, df, Seq("signup", "click", "purchase"))
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("funnel_stream")
      .outputMode("update").start()
    try {
      def t(h: Int) = Timestamp.valueOf(f"2024-05-01 $h%02d:00:00")
      // batch 1: user 1 signs up; user 2 clicks (no signup yet — no progress)
      mem.addData((1L, t(1), "signup", 10L), (2L, t(1), "click", 11L))
      q.processAllAvailable()
      // batch 2: user 1 clicks (cross-batch step 2); user 2 signs up
      // (step 1 now, but the old click must NOT count retroactively)
      mem.addData((1L, t(2), "click", 12L), (2L, t(2), "signup", 13L))
      q.processAllAvailable()
      // batch 3: user 1 purchases (step 3); user 3 sends signup AND
      // click at the SAME ts — the event_id tie-break folds signup
      // (id 14) before click (id 15), so both steps complete
      mem.addData((1L, t(3), "purchase", 20L),
        (3L, t(3), "signup", 14L), (3L, t(3), "click", 15L))
      q.processAllAvailable()
      val rows = spark.table("funnel_stream").collect()
        .map(r => (r.getLong(0), r.getInt(1)))
      // progress emissions only: u1 1→2→3, u2 only 1 (in batch 2)
      assert(rows.count(_._1 == 1L) == 3 && rows.filter(_._1 == 1L).map(_._2).max == 3)
      assert(rows.filter(_._1 == 2L).map(_._2).toSeq == Seq(1))
      assert(rows.filter(_._1 == 3L).map(_._2).toSeq == Seq(2))
    } finally q.stop()
  }

  test("funnelStream: numeric ties fold in NUMERIC order (id 9 before 10), " +
      "and a frame without the tie column falls back to a constant tie") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Long)]
    val df = mem.toDF().toDF("user_id", "ts", "event_type", "event_id")
    val out = EventStreams.funnelStream(spark, df, Seq("signup", "click"))
    val q = out.writeStream.format("memory").queryName("funnel_numtie")
      .outputMode("update").start()
    try {
      val ts = Timestamp.valueOf("2024-05-01 01:00:00")
      // equal-ts events with ids 9 (signup) and 10 (click): numeric order
      // folds signup first → both steps complete. A lexicographic string
      // cast would fold "10" < "9" — click before signup → only step 1.
      mem.addData((1L, ts, "click", 10L), (1L, ts, "signup", 9L))
      q.processAllAvailable()
      val rows = spark.table("funnel_numtie").collect()
        .map(r => (r.getLong(0), r.getInt(1)))
      assert(rows.toSeq == Seq((1L, 2)),
        s"native numeric tie order must fold id 9 before id 10: ${rows.toSeq}")
    } finally q.stop()

    // pre-tieCol input contract: (user_id, ts, event_type) only — the
    // operator must not demand an event_id column that isn't there
    val mem2 = MemoryStream[(Long, Timestamp, String)]
    val df2 = mem2.toDF().toDF("user_id", "ts", "event_type")
    val q2 = EventStreams.funnelStream(spark, df2, Seq("signup", "click"))
      .writeStream.format("memory").queryName("funnel_notie")
      .outputMode("update").start()
    try {
      mem2.addData((5L, Timestamp.valueOf("2024-05-01 01:00:00"), "signup"),
        (5L, Timestamp.valueOf("2024-05-01 02:00:00"), "click"))
      q2.processAllAvailable()
      val rows = spark.table("funnel_notie").collect()
        .map(r => (r.getLong(0), r.getInt(1)))
      assert(rows.toSeq == Seq((5L, 2)), s"got ${rows.toSeq}")
    } finally q2.stop()
  }

  test("sessionize aggregates per user via mapGroupsWithState") {
    val events = Tables.load(spark, sf, "events").limit(100)
    val sessions = EventStreams.sessionize(spark, events)
    val total = sessions.agg(sum("n_events")).head().getLong(0)
    assert(total == 100)
    assert(sessions.columns.toSeq == Seq("user_id", "n_events", "sum_value"))
  }

  test("dedupStream drops watermark-window duplicates on a stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id")
    val q = EventStreams.dedupStream(df, "event_id", "10 minutes")
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, Timestamp.valueOf("2024-01-01 00:00:00"), 7L),
        (1L, Timestamp.valueOf("2024-01-01 00:00:01"), 7L), // dup id, in window
        (2L, Timestamp.valueOf("2024-01-01 00:01:00"), 8L))
      q.processAllAvailable()
      assert(spark.table("dedup_test").select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("sessionWindowStats (batch) matches Sessionize.sessions semantics") {
    val events = Tables.load(spark, sf, "events")
    val native = EventStreams.sessionWindowStats(events, "12 hours")
      .select("user_id", "session_start", "session_end", "n_events")
    val manual = graft.operators.Sessionize.sessions(events, "user_id", "ts", "12 hours")
      .select("user_id", "session_start", "session_end", "n_events")
    assert(native.exceptAll(manual).isEmpty && manual.exceptAll(native).isEmpty)
  }

  test("stream-stream interval join buffers and matches within the bound") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val joined = EventStreams.errorClickJoin(df, boundSeconds = 3600)
    assert(joined.isStreaming)
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      mem.addData(
        (10L, Timestamp.valueOf("2024-01-01 09:30:00"), 1L, "click", 1.0),
        (11L, Timestamp.valueOf("2024-01-01 07:00:00"), 1L, "click", 1.0), // outside bound
        (12L, Timestamp.valueOf("2024-01-01 09:50:00"), 2L, "click", 1.0), // other user
        (20L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "error", 0.0))
      q.processAllAvailable()
      val rows = spark.table("ss_join")
        .select("error_id", "click_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSeq == Seq((20L, 10L)))
    } finally q.stop()
  }

  test("idempotentParquetSink rewrites a batch directory instead of duplicating") {
    implicit val sqlCtx = spark.sqlContext
    val base = "/root/repo/target/graft-tmp/sink-test"
    val fs = new java.io.File(base)
    def del(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(del); f.delete()
    }
    if (fs.exists()) del(fs)
    val mem = MemoryStream[(Long, Double)]
    val df = mem.toDF().toDF("id", "v")
    val q = EventStreams.idempotentParquetSink(df, s"$base/data", s"$base/ckpt")
    try {
      mem.addData((1L, 1.0), (2L, 2.0))
      q.processAllAvailable()
      mem.addData((3L, 3.0))
      q.processAllAvailable()
      val out = spark.read.parquet(s"$base/data")
      assert(out.count() == 3)
      assert(out.columns.contains("batch_id")) // partition column from the path
      // replay batch 0 (restart/retry path): same directory is REWRITTEN,
      // not appended — total row count is unchanged
      EventStreams.writeBatch(
        Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"), s"$base/data", 0L)
      assert(spark.read.parquet(s"$base/data").count() == 3)
    } finally q.stop()
  }

  test("curation gates are stream-compatible: split/sample assign identically on a stream") {
    // splitCorpus and deterministicSample are MAP-ONLY gate expressions
    // with no state, so the same operator runs unchanged under
    // Structured Streaming — and the reproducibility property means a
    // doc gets the SAME split whether it arrives in a batch backfill or
    // through the stream (the provenance story for incremental corpus
    // ingestion)
    import graft.pipeline.Curation
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val streamed = Curation.splitCorpus(
      mem.toDF().toDF("id"), "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(streamed.isStreaming)
    val q = streamed.writeStream.format("memory").queryName("split_stream")
      .outputMode("append").start()
    try {
      mem.addData(1L to 500L: _*)
      q.processAllAvailable()
      val viaStream = spark.table("split_stream")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val viaBatch = Curation.splitCorpus(
        (1L to 500L).toDF("id"), "id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(viaStream == viaBatch,
        "stream and batch must assign identical splits")
      // the sampling gate too: the filter commutes with streaming
      val sampled = Curation.deterministicSample(
        mem.toDF().toDF("id"), "id", fraction = 0.25)
      assert(sampled.isStreaming)
    } finally q.stop()
  }
}
