package graft.agent

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}
import graft.engine.Engine
import graft.response._

/** HttpLlm against a local in-JVM stub server (the sandbox has no
  * network egress, so this is also the only honest way to test it).
  * Mirrors the reference's own offline LLM tests, which stub the client
  * (`extensions/llms/openai/tests/test_openai.py`).
  */
class HttpLlmSpec extends AnyFunSuite {

  /** One-endpoint stub: records the last request, serves scripted
    * (status, body) responses in order, repeating the last. */
  private class Stub(responses: Seq[(Int, String)]) {
    val hits = new AtomicInteger(0)
    @volatile var lastBody: String = ""
    @volatile var lastAuth: String = ""
    @volatile var lastPath: String = ""
    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      lastBody = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      lastAuth = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
      lastPath = ex.getRequestURI.getPath
      val i = math.min(hits.getAndIncrement(), responses.length - 1)
      val (status, body) = responses(i)
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    val url: String = s"http://127.0.0.1:${server.getAddress.getPort}/v1"
    def stop(): Unit = server.stop(0)
  }

  private def chatJson(content: String): String = {
    // build with jackson so escaping is exact
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.createObjectNode()
    root.putArray("choices").addObject().putObject("message").put("content", content)
    m.writeValueAsString(root)
  }

  private def llm(stub: Stub, retries: Int = 2) =
    new HttpLlm(stub.url, model = "test-model", apiKey = Some("sk-test"),
      maxRetries = retries, backoffMillis = 1L)

  test("happy path: posts chat-completions shape, parses content") {
    val stub = new Stub(Seq(200 -> chatJson("SELECT 1 AS one")))
    try {
      val out = llm(stub).generate("hello world")
      assert(out == "SELECT 1 AS one")
      assert(stub.lastPath == "/v1/chat/completions")
      assert(stub.lastAuth == "Bearer sk-test")
      val req = new com.fasterxml.jackson.databind.ObjectMapper().readTree(stub.lastBody)
      assert(req.path("model").asText() == "test-model")
      assert(req.path("messages").path(0).path("role").asText() == "user")
      assert(req.path("messages").path(0).path("content").asText() == "hello world")
      assert(req.path("temperature").asDouble() == 0.0)
      assert(req.path("max_tokens").asInt() == 1000)
    } finally stub.stop()
  }

  test("retries transient 500/429 with backoff, then succeeds") {
    val stub = new Stub(Seq(
      500 -> "boom", 429 -> "slow down", 200 -> chatJson("ok")))
    try {
      assert(llm(stub).generate("q") == "ok")
      assert(stub.hits.get() == 3)
    } finally stub.stop()
  }

  test("permanent 4xx fails immediately without retry") {
    val stub = new Stub(Seq(401 -> """{"error":"bad key"}"""))
    try {
      val e = intercept[RuntimeException](llm(stub).generate("q"))
      assert(e.getMessage.contains("401"))
      assert(stub.hits.get() == 1)
    } finally stub.stop()
  }

  test("exhausted retries surface the last error") {
    val stub = new Stub(Seq(503 -> "down"))
    try {
      val e = intercept[RuntimeException](llm(stub, retries = 1).generate("q"))
      assert(e.getMessage.contains("failed after 2 attempts"))
      assert(stub.hits.get() == 2)
    } finally stub.stop()
  }

  test("malformed response body is a clear error, not a crash") {
    val stub = new Stub(Seq(200 -> """{"choices":[]}"""))
    try {
      val e = intercept[RuntimeException](llm(stub).generate("q"))
      assert(e.getMessage.contains("malformed LLM response"))
    } finally stub.stop()
  }

  test("generateChat posts the full multi-message conversation") {
    val stub = new Stub(Seq(200 -> chatJson("ok")))
    try {
      val msgs = Seq(
        ChatMessage("system", "You are terse."),
        ChatMessage("user", "hi"),
        ChatMessage("assistant", "hello"),
        ChatMessage("user", "again"))
      assert(llm(stub).generateChat(msgs) == "ok")
      val req = new com.fasterxml.jackson.databind.ObjectMapper().readTree(stub.lastBody)
      val sent = req.path("messages")
      assert(sent.size() == 4)
      assert(sent.path(0).path("role").asText() == "system")
      assert(sent.path(3).path("content").asText() == "again")
    } finally stub.stop()
  }

  test("missing API key fails fast at construction") {
    val e = intercept[IllegalArgumentException] {
      new HttpLlm("http://localhost:1", "m",
        apiKeyEnv = "GRAFT_TEST_NO_SUCH_KEY_VAR")
    }
    assert(e.getMessage.contains("GRAFT_TEST_NO_SUCH_KEY_VAR"))
  }
}

/** End-to-end: Agent.chat through HttpLlm and the stub server — the full
  * prompt→HTTP→SQL-gate→execute loop with zero canned shortcuts. */
class HttpLlmAgentSpec extends SparkSpec {

  test("agent chat end-to-end through the HTTP client") {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    def chatJson(content: String): String = {
      val root = m.createObjectNode()
      root.putArray("choices").addObject().putObject("message").put("content", content)
      m.writeValueAsString(root)
    }
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    @volatile var sawPrompt: String = ""
    server.createContext("/", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      sawPrompt = m.readTree(body).path("messages").path(0).path("content").asText()
      val resp = chatJson("```sql\nSELECT count(*) AS n FROM region\n```")
      val bytes = resp.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try {
      val e = new Engine(spark, "/root/repo/target/graft-tmp/httpllm-ds")
      e.register("region", Tables.load(spark, sf, "region"))
      val llm = new HttpLlm(s"http://127.0.0.1:${server.getAddress.getPort}/v1",
        model = "test-model", apiKey = Some("sk-test"), backoffMillis = 1L)
      val agent = new Agent(e, llm)
      agent.chat("how many regions?") match {
        case NumberR(v) => assert(v == 5.0)
        case other      => fail(s"expected NumberR, got $other")
      }
      // the serialized schema + question actually went over the wire
      assert(sawPrompt.contains("""table_name="region""""))
      assert(sawPrompt.contains("how many regions?"))
      assert(llm.lastPrompt.exists(_.contains("how many regions?")))
    } finally server.stop(0)
  }
}
