package graft.agent

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Deterministic in-JVM chat-completions endpoint — the fixture side of
  * the "LLM calls as operators" surface. A real pipeline distills an
  * LLM teacher into a cheap classifier (the FineWeb-Edu recipe); its
  * provenance audit must be able to REPLAY that run, which requires the
  * teacher's replies to be a pure function of the prompt. This server
  * makes that function explicit: `reply(prompt)` is user-supplied and
  * deterministic, so an external oracle can re-derive every label —
  * the mechanism behind the oracle-checked distill loop
  * (p121_llm_distill_screen) and the composed-chain AnnotateSpec cases.
  *
  * Serves the OpenAI-style `/chat/completions` shape [[HttpLlm]] speaks
  * (reference: extensions/llms/openai/pandasai_openai/base.py request/
  * response handling; pandasai/llm/fake.py is the reference's own
  * deterministic-LLM fixture — same idea, HTTP-shaped here so the
  * DISTRIBUTED client path is what gets exercised). JDK
  * `HttpServer` on an ephemeral 127.0.0.1 port — no dependencies, no
  * egress. Thread-safe: replies are computed per-request from the
  * request body alone; `hits` counts served requests (a distillation
  * test asserts only the SAMPLE was annotated). Call [[stop]] when done.
  */
final class StubLlmServer private (reply: String => String) {
  val hits = new AtomicInteger(0)
  private val mapper = new ObjectMapper()
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
  server.createContext("/", (ex: HttpExchange) => {
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    hits.incrementAndGet()
    val prompt = mapper.readTree(body)
      .path("messages").path(0).path("content").asText()
    val root = mapper.createObjectNode()
    root.putArray("choices").addObject().putObject("message")
      .put("content", reply(prompt))
    val bytes = mapper.writeValueAsString(root).getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(200, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  })
  server.start()

  /** Base URL for [[graft.pipeline.LlmAnnotateConfig.baseUrl]]. */
  val url: String = s"http://127.0.0.1:${server.getAddress.getPort}/v1"

  def stop(): Unit = server.stop(0)
}

object StubLlmServer {
  /** Start a server whose every completion is `reply(prompt)`. */
  def start(reply: String => String): StubLlmServer = new StubLlmServer(reply)
}
