package graft.pipeline

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Distributed LLM annotation against an in-JVM stub endpoint (local
  * mode: executor threads share the JVM, so the stub sees every task's
  * requests). Covers the operator's real semantics — per-row success,
  * retry-through-transients, permanent-failure audit capture, rate
  * pacing — which no SQL oracle can express.
  */
class AnnotateSpec extends SparkSpec {
  import spark.implicits._

  /** Scripted stub: echoes a canned score derived from the request's
    * own prompt (so per-row results are checkable), after serving any
    * scripted error statuses first. Thread-safe: concurrent tasks hit
    * it in arbitrary order.
    */
  private class Stub(errorPrefix: Seq[Int] = Nil,
      scoreOf: String => String = b => "0.5") {
    val hits = new AtomicInteger(0)
    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    server.createContext("/", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val i = hits.getAndIncrement()
      val (status, out) =
        if (i < errorPrefix.length) (errorPrefix(i), "scripted error")
        else {
          val prompt = mapper.readTree(body)
            .path("messages").path(0).path("content").asText()
          val root = mapper.createObjectNode()
          root.putArray("choices").addObject().putObject("message")
            .put("content", scoreOf(prompt))
          (200, mapper.writeValueAsString(root))
        }
      val bytes = out.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    val url: String = s"http://127.0.0.1:${server.getAddress.getPort}/v1"
    def stop(): Unit = server.stop(0)
  }

  private def cfg(url: String) = LlmAnnotateConfig(
    baseUrl = url, model = "stub", apiKey = Some("sk-test"),
    backoffMillis = 1L, requestsPerSecond = 1000.0)

  private def docs(n: Int) =
    (0 until n).map(i => (i.toLong, s"document number $i")).toDF("doc_id", "text")

  test("llmScore annotates every row with a per-document score, no shuffle") {
    // stub scores doc k as "score: k.5" — parsed per row, provably
    // matched to the right document
    val stub = new Stub(scoreOf = p => {
      val k = "\\d+".r.findFirstIn(p).get
      s"quality score: $k.5 out of 10"
    })
    try {
      val out = Annotate.llmScore(docs(10).repartition(3), "text",
        "Rate this: {text}", cfg(stub.url))
      // the operator itself adds no exchange: the only one in the plan
      // is the explicit repartition(3) above
      val planStr = out.queryExecution.executedPlan.toString
      assert(planStr.split("Exchange").length <= 2,
        s"annotate must be a single mapPartitions pass:\n$planStr")
      val rows = out.select("doc_id", "score", "annotation_error")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.isNullAt(2)))
      assert(rows.length == 10 && rows.forall(_._3), "no errors")
      rows.foreach { case (id, score, _) => assert(score == id + 0.5) }
      assert(stub.hits.get() == 10)
    } finally stub.stop()
  }

  test("transient 429/500 retry through; the row still succeeds") {
    val stub = new Stub(errorPrefix = Seq(500, 429))
    try {
      val out = Annotate.annotate(docs(1), "text", "q: {text}", cfg(stub.url))
        .collect().head
      assert(out.getString(2) == "0.5" && out.isNullAt(3))
      assert(stub.hits.get() == 3, "two transient failures + one success")
    } finally stub.stop()
  }

  test("permanent failure lands in the audit column, job survives") {
    // single partition, concurrency 1 → deterministic request order:
    // row 0 gets the scripted 400 (permanent, no retry), rows 1-2 succeed
    val stub = new Stub(errorPrefix = Seq(400))
    try {
      val out = Annotate.annotate(docs(3).coalesce(1), "text", "q: {text}",
        cfg(stub.url).copy(concurrency = 1))
        .select("doc_id", "annotation", "annotation_error")
        .collect().sortBy(_.getLong(0))
      assert(out.length == 3)
      assert(out.head.isNullAt(1) && out.head.getString(2).contains("400"))
      assert(out.tail.forall(r => r.getString(1) == "0.5" && r.isNullAt(2)))
    } finally stub.stop()
  }

  test("rate limiter paces request starts per partition") {
    val stub = new Stub()
    try {
      // 6 requests at 20 rps on one partition: slots at 0,50,...,250ms
      // → the pass cannot finish faster than ~250ms even with 4 workers
      val t0 = System.nanoTime()
      val n = Annotate.annotate(docs(6).coalesce(1), "text", "q: {text}",
        cfg(stub.url).copy(requestsPerSecond = 20.0)).count()
      val elapsedMs = (System.nanoTime() - t0) / 1e6
      assert(n == 6 && stub.hits.get() == 6)
      assert(elapsedMs >= 200, s"pacing must spread starts: ${elapsedMs}ms")
    } finally stub.stop()
  }

  test("llmLabel normalizes single-label replies, nulls ambiguous ones") {
    val stub = new Stub(scoreOf = p =>
      if (p.contains("number 0")) "This is SPAM."
      else if (p.contains("number 1")) "ham"
      else "could be spam or ham")
    try {
      val out = Annotate.llmLabel(docs(3).coalesce(1), "text",
        "Classify: {text}", Seq("spam", "ham"), cfg(stub.url))
        .select("doc_id", "label", "annotation")
        .collect().sortBy(_.getLong(0))
      assert(out(0).getString(1) == "spam")
      assert(out(1).getString(1) == "ham")
      assert(out(2).isNullAt(1) && out(2).getString(2).contains("could be"))
    } finally stub.stop()
  }

  test("llmExtract parses fenced JSON replies into a typed struct, audits junk") {
    import org.apache.spark.sql.types.StructType
    val stub = new Stub(scoreOf = p =>
      if (p.contains("number 0"))
        "```json\n{\"title\": \"Doc Zero\", \"score\": 0.9}\n```"
      else if (p.contains("number 1")) "{\"title\": \"One\", \"score\": 0.1}"
      else "sorry, I cannot help with that")
    try {
      val out = Annotate.llmExtract(docs(3).coalesce(1), "text",
        "Extract: {text}", StructType.fromDDL("title string, score double"),
        cfg(stub.url))
        .selectExpr("doc_id", "extracted.title", "extracted.score", "annotation")
        .collect().sortBy(_.getLong(0))
      assert(out(0).getString(1) == "Doc Zero" && out(0).getDouble(2) == 0.9,
        "markdown fence stripped before parse")
      assert(out(1).getString(1) == "One" && out(1).getDouble(2) == 0.1)
      // non-JSON reply: null struct fields, raw reply preserved
      assert(out(2).isNullAt(1) && out(2).getString(3).contains("sorry"))
    } finally stub.stop()
  }

  test("annotate is stream-compatible: labels micro-batches incrementally") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val stub = new Stub(scoreOf = p => {
      val k = "\\d+".r.findFirstIn(p).get
      s"streamed score $k.25"
    })
    try {
      val mem = MemoryStream[(Long, String)]
      val df = mem.toDF().toDF("doc_id", "text")
      // one mapPartitions pass has no streaming-unsupported operator —
      // the same plan runs per micro-batch
      val out = Annotate.llmScore(df, "text", "Rate: {text}", cfg(stub.url))
      assert(out.isStreaming)
      val q = out.select("doc_id", "score").writeStream
        .format("memory").queryName("annotate_stream")
        .outputMode("append").start()
      try {
        mem.addData((0L, "document number 0"), (1L, "document number 1"))
        q.processAllAvailable()
        mem.addData((2L, "document number 2"))
        q.processAllAvailable()
        val rows = spark.table("annotate_stream").collect()
          .map(r => (r.getLong(0), r.getDouble(1))).toMap
        assert(rows == Map(0L -> 0.25, 1L -> 1.25, 2L -> 2.25), s"got $rows")
        assert(stub.hits.get() == 3, "each row annotated exactly once")
      } finally q.stop()
    } finally stub.stop()
  }

  test("config toString never leaks the API key") {
    val c = cfg("http://example.invalid/v1")
    assert(!c.toString.contains("sk-test"), c.toString)
    assert(c.toString.contains("***"))
  }

  test("null text annotates as empty document, not a crash") {
    val stub = new Stub()
    try {
      val df = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
      val out = Annotate.annotate(df, "text", "q: {text}", cfg(stub.url)).collect().head
      assert(out.getString(2) == "0.5" && out.isNullAt(3))
    } finally stub.stop()
  }
}
