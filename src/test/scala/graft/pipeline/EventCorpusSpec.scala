package graft.pipeline

import java.sql.Timestamp

import graft.SparkSpec

/** Event-corpus contracts: JSON extraction handles malformed/missing
  * fields without failing the scan, the telemetry card counts coverage
  * honestly, and dialogue documents order turns by the total
  * (ts, tie) order.
  */
class EventCorpusSpec extends SparkSpec {
  import spark.implicits._

  test("propsStats: malformed and missing fields count as unparsed, not errors") {
    val events = Seq(
      ("click", """{"k": 10}"""),
      ("click", """{"k": 60}"""),
      ("click", """not json at all"""),
      ("click", """{"other": 5}"""),
      ("view", """{"k": 3}"""),
    ).toDF("event_type", "props")
    val m = EventCorpus.propsStats(events, "event_type", "props", "k", hiThreshold = 50L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(6))).toMap
    assert(m("click") == ((4L, 2L, 70L, 0.5)), s"click card: ${m("click")}")
    assert(m("view") == ((1L, 1L, 3L, 0.0)))
  }

  test("dialogueCorpus: turns ordered by (ts, tie), sessions split at the gap") {
    def t(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val events = Seq(
      (1L, t(1), "click", 1.0, 100L),
      (1L, t(2), "view", 2.0, 101L),
      (1L, t(20), "purchase", 3.0, 102L), // > 12h later → new session
      (2L, t(1), "signup", 4.0, 200L),
      (2L, t(1), "error", 5.0, 103L), // same ts → tie broken by event_id
    ).toDF("user_id", "ts", "event_type", "value", "event_id")
    val out = EventCorpus.dialogueCorpus(events, "user_id", "ts", "event_type",
      "value", "event_id", gap = "12 hours")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3), r.getDouble(4)))
      .sortBy(x => (x._1, x._3))
    assert(out.length == 3, s"expected 3 sessions: ${out.toSeq}")
    assert(out.contains((1L, 2L, "click -> view", 3.0)))
    assert(out.contains((1L, 1L, "purchase", 3.0)))
    // event_id 103 < 200 → error before signup despite equal ts
    assert(out.contains((2L, 2L, "error -> signup", 9.0)), s"got ${out.toSeq}")
  }

  test("JSON extraction is stream-safe: incremental aggregate over a MemoryStream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val agg = mem.toDF().toDF("event_type", "props")
      .select(col("event_type"),
        EventCorpus.jsonLongField(col("props"), "k").as("k"))
      .groupBy("event_type").agg(sum("k").as("sum_k"))
    assert(agg.isStreaming)
    val q = agg.writeStream.format("memory").queryName("props_stream")
      .outputMode("complete").start()
    try {
      mem.addData(("click", """{"k": 5}"""), ("click", """{"k": 7}"""),
        ("click", "not json"))
      q.processAllAvailable()
      mem.addData(("click", """{"k": 8}"""))
      q.processAllAvailable()
      val r = spark.table("props_stream").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(r == Map("click" -> 20L), s"got $r")
    } finally q.stop()
  }
}
