package graft.agent

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

/** Dependency-free HTTP chat client implementing [[Llm]] against any
  * OpenAI-compatible chat-completions endpoint (the reference ships this
  * surface as `extensions/llms/openai/pandasai_openai/base.py:13-47` —
  * configurable `api_base`, bearer `api_token`, `temperature`,
  * `max_tokens`, `max_retries`; request = chat messages, response =
  * `choices[0].message.content`).
  *
  * Spark-first notes: the client runs ONLY on the driver (one call per
  * Agent.chat turn) — it is never shipped into a task, so there is no
  * serialization or per-row cost. JSON via the jackson-databind that
  * Spark itself bundles; transport via the JDK 11+ HttpClient. No vendor
  * SDK, no new dependencies.
  *
  * The API key resolves from the explicit parameter first, then the
  * environment variable named by `apiKeyEnv`; a missing key fails fast at
  * construction (reference raises APIKeyNotFoundError before any request,
  * `pandasai/llm/base.py`). Transient failures (HTTP 429/5xx, connection
  * errors) retry up to `maxRetries` with linear backoff; 4xx other than
  * 429 are permanent and throw immediately.
  */
final class HttpLlm(
    val baseUrl: String,
    val model: String,
    apiKey: Option[String] = None,
    apiKeyEnv: String = "GRAFT_LLM_API_KEY",
    val temperature: Double = 0.0,
    val maxTokens: Int = 1000,
    requestTimeout: Duration = Duration.ofSeconds(60),
    val maxRetries: Int = 2,
    backoffMillis: Long = 250L,
) extends Llm {

  private val key: String = apiKey
    .orElse(sys.env.get(apiKeyEnv))
    .getOrElse(throw new IllegalArgumentException(
      s"no API key: pass apiKey or set $$${apiKeyEnv}"))

  @volatile var lastPrompt: Option[String] = None

  private val mapper = new ObjectMapper()
  private val http = HttpClient.newBuilder()
    .connectTimeout(requestTimeout)
    .build()

  private val endpoint: URI =
    URI.create(baseUrl.stripSuffix("/") + "/chat/completions")

  private val embedEndpoint: URI =
    URI.create(baseUrl.stripSuffix("/") + "/embeddings")

  private def requestBody(messages: Seq[ChatMessage]): String = {
    val root: ObjectNode = mapper.createObjectNode()
    root.put("model", model)
    root.put("temperature", temperature)
    root.put("max_tokens", maxTokens)
    val msgs = root.putArray("messages")
    messages.foreach { cm =>
      val m = msgs.addObject()
      m.put("role", cm.role)
      m.put("content", cm.content)
    }
    mapper.writeValueAsString(root)
  }

  private def parseContent(body: String): String = {
    val root = mapper.readTree(body)
    val content = root.path("choices").path(0).path("message").path("content")
    if (content.isMissingNode || !content.isTextual)
      throw new RuntimeException(
        s"malformed LLM response: no choices[0].message.content in ${body.take(200)}")
    content.asText()
  }

  private def retriable(status: Int): Boolean = status == 429 || status >= 500

  override def generate(prompt: String): String =
    generateChat(Seq(ChatMessage("user", prompt)))

  /** Multi-message chat form — post a full conversation (the shape
    * Memory.toChatMessages produces), not just one user turn. */
  def generateChat(messages: Seq[ChatMessage]): String = {
    require(messages.nonEmpty, "generateChat needs at least one message")
    lastPrompt = messages.lastOption.map(_.content)
    parseContent(postWithRetry(endpoint, requestBody(messages)))
  }

  /** Batched embeddings (the `/embeddings` surface of the same
    * OpenAI-compatible API family the chat client targets: request =
    * `{model, input: [texts]}`, response = `data[i].embedding` float
    * arrays with an `index` field). One HTTP round trip embeds the whole
    * batch — the shape [[graft.pipeline.Annotate.llmEmbed]] drives from
    * executors, where per-row requests would multiply endpoint load by
    * the batch size. Results are re-ordered by the response's own
    * `index` (the spec says order matches `input`, but indices are
    * authoritative) and the count must match the input count — a
    * short response is a protocol error, not a partial success.
    */
  def embed(texts: Seq[String]): Seq[Array[Float]] = {
    require(texts.nonEmpty, "embed needs at least one input")
    val root = mapper.createObjectNode()
    root.put("model", model)
    val in = root.putArray("input")
    texts.foreach(in.add)
    val body = postWithRetry(embedEndpoint, mapper.writeValueAsString(root))
    val data = mapper.readTree(body).path("data")
    if (!data.isArray || data.size() != texts.size)
      throw new RuntimeException(
        s"malformed embeddings response: expected ${texts.size} data entries, " +
          s"got ${if (data.isArray) data.size() else "none"} in ${body.take(200)}")
    val out = new Array[Array[Float]](texts.size)
    var i = 0
    while (i < data.size()) {
      val node = data.get(i)
      val idx = node.path("index").asInt(i)
      val emb = node.path("embedding")
      if (!emb.isArray || idx < 0 || idx >= out.length || out(idx) != null)
        throw new RuntimeException(
          s"malformed embeddings response entry $i in ${body.take(200)}")
      val v = new Array[Float](emb.size())
      var j = 0
      while (j < emb.size()) { v(j) = emb.get(j).floatValue(); j += 1 }
      out(idx) = v
      i += 1
    }
    out.toSeq
  }

  /** Shared POST + retry loop: 200 returns the body; 429/5xx and
    * connection-level IO errors retry with linear backoff; other 4xx
    * throw immediately (permanent). */
  private def postWithRetry(uri: URI, body: String): String = {
    val req = HttpRequest.newBuilder(uri)
      .timeout(requestTimeout)
      .header("Content-Type", "application/json")
      .header("Authorization", s"Bearer $key")
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
      .build()

    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= maxRetries) {
      if (attempt > 0) Thread.sleep(backoffMillis * attempt)
      try {
        val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() == 200) return resp.body()
        val err = new RuntimeException(
          s"LLM endpoint returned HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
        if (!retriable(resp.statusCode())) throw err
        lastErr = err
      } catch {
        case e: java.io.IOException => lastErr = e // connection-level: retry
      }
      attempt += 1
    }
    throw new RuntimeException(
      s"LLM request failed after ${maxRetries + 1} attempts: ${lastErr.getMessage}",
      lastErr)
  }
}
