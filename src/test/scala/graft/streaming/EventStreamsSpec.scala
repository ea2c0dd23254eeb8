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

  test("sessionize aggregates per user via mapGroupsWithState") {
    val events = Tables.load(spark, sf, "events").limit(100)
    val sessions = EventStreams.sessionize(spark, events)
    val total = sessions.agg(sum("n_events")).head().getLong(0)
    assert(total == 100)
    assert(sessions.columns.toSeq == Seq("user_id", "n_events", "sum_value"))
  }
}
