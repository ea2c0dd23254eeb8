package graft.pipeline

import java.util.concurrent.{Callable, Executors, ThreadFactory, TimeUnit}

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.agent.{ChatMessage, HttpLlm}

/** Connection settings + request shape for [[Annotate]] — a plain
  * serializable value so every executor can construct its own
  * [[HttpLlm]] (the client holds a JDK HttpClient and is NOT
  * serializable; config ships, clients don't).
  *
  * The key resolves like the driver-side client: explicit `apiKey`
  * first, then the `apiKeyEnv` environment variable — which must be
  * present in the EXECUTOR environment on a real cluster
  * (spark.executorEnv.GRAFT_LLM_API_KEY=...), not just the driver.
  *
  * `requestsPerSecond` is a PER-PARTITION budget: the global request
  * rate is `requestsPerSecond × simultaneously-running partitions`
  * (≤ the executor core count). Size it as
  * endpointBudget / min(numPartitions, totalCores). `concurrency` is
  * the in-flight bound within one partition; the limiter still spaces
  * request STARTS, so concurrency > 1 only helps hide latency, it
  * never exceeds the rate.
  */
final case class LlmAnnotateConfig(
    baseUrl: String,
    model: String,
    apiKey: Option[String] = None,
    apiKeyEnv: String = "GRAFT_LLM_API_KEY",
    temperature: Double = 0.0,
    maxTokens: Int = 64,
    maxRetries: Int = 2,
    backoffMillis: Long = 250L,
    requestTimeoutSec: Int = 60,
    concurrency: Int = 4,
    requestsPerSecond: Double = 8.0,
) extends Serializable {
  require(concurrency >= 1, s"concurrency must be >= 1: $concurrency")
  require(requestsPerSecond > 0, s"requestsPerSecond must be > 0: $requestsPerSecond")

  /** Case-class toString would print the API key into logs, task
    * descriptions, and error messages — redact it. */
  override def toString: String =
    s"LlmAnnotateConfig($baseUrl,$model,${apiKey.map(_ => "***")},$apiKeyEnv," +
      s"$temperature,$maxTokens,$maxRetries,$backoffMillis,$requestTimeoutSec," +
      s"$concurrency,$requestsPerSecond)"
}

/** Distributed batched LLM annotation — score or label a corpus column
  * by posting each document through the chat endpoint, as a DataFrame
  * operator rather than a driver loop.
  *
  * Spark-first shape: ONE `mapPartitions` pass — no shuffle, no
  * driver round-trips, parallelism = partitions × per-partition
  * `concurrency`. Each partition builds one [[HttpLlm]] (retry with
  * linear backoff on 429/5xx is the client's), runs rows through a
  * bounded thread pool in waves, and spaces request starts with a
  * token-interval rate limiter shared by the partition's workers.
  * Failures NEVER kill the job: a row whose request exhausts retries
  * (or hits a permanent 4xx) carries a null annotation and the error
  * message in the audit column, so a 100 TB run surfaces its failure
  * rate as data (`WHERE annotation_error IS NOT NULL`) instead of a
  * stack trace at hour six.
  *
  * This is deliberately NOT an oracle-checked SparkEntry query: the
  * operator's semantics are network effects (retries, rate, error
  * capture), verified in AnnotateSpec against an in-JVM stub endpoint
  * with scripted 429/500/400 responses.
  */
object Annotate {

  /** Minimum-interval rate limiter: thread-safe, allocates each request
    * a start slot `1/rps` after the previous slot (burst-free pacing —
    * an endpoint quota cares about sustained rate; sleeping outside the
    * lock keeps the slot handout itself non-blocking).
    */
  private final class RateLimiter(rps: Double) {
    private val intervalNanos = (1e9 / rps).toLong
    private var nextSlot = 0L
    def acquire(): Unit = {
      val slot = synchronized {
        val now = System.nanoTime()
        val t = math.max(now, nextSlot)
        nextSlot = t + intervalNanos
        t
      }
      val wait = slot - System.nanoTime()
      if (wait > 0) Thread.sleep(wait / 1000000, (wait % 1000000).toInt)
    }
  }

  private def daemonFactory = new ThreadFactory {
    override def newThread(r: Runnable): Thread = {
      val t = new Thread(r, "graft-annotate")
      t.setDaemon(true) // backstop if the consumer abandons the iterator
      t
    }
  }

  /** Raw annotation: appends `annotation` (the model's text, null on
    * failure) and `annotation_error` (null on success) to every row.
    * `promptTemplate` must contain `{text}`, replaced per document.
    */
  def annotate(
      df: DataFrame, textCol: String, promptTemplate: String,
      config: LlmAnnotateConfig,
  ): DataFrame = {
    require(promptTemplate.contains("{text}"),
      "promptTemplate must contain the {text} placeholder")
    val textIdx = df.schema.fieldIndex(textCol)
    val outSchema = df.schema
      .add("annotation", StringType).add("annotation_error", StringType)
    val enc = Encoders.row(outSchema)
    df.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val llm = new HttpLlm(config.baseUrl, config.model,
          apiKey = config.apiKey, apiKeyEnv = config.apiKeyEnv,
          temperature = config.temperature, maxTokens = config.maxTokens,
          requestTimeout = java.time.Duration.ofSeconds(config.requestTimeoutSec),
          maxRetries = config.maxRetries, backoffMillis = config.backoffMillis)
        val limiter = new RateLimiter(config.requestsPerSecond)
        val pool = Executors.newFixedThreadPool(config.concurrency, daemonFactory)
        def call(row: Row): Callable[Row] = () => {
          val text = if (row.isNullAt(textIdx)) "" else row.get(textIdx).toString
          val prompt = promptTemplate.replace("{text}", text)
          try {
            limiter.acquire()
            val out = llm.generateChat(Seq(ChatMessage("user", prompt)))
            Row.fromSeq(row.toSeq :+ out :+ null)
          } catch {
            case e: Exception =>
              Row.fromSeq(row.toSeq :+ null :+ s"${e.getClass.getSimpleName}: ${e.getMessage}")
          }
        }
        // waves of `concurrency`: bounded in-flight requests AND bounded
        // buffered rows — the pass stays streaming, never partition-sized
        val annotated = it.grouped(config.concurrency).flatMap { wave =>
          val futures = wave.map(r => pool.submit(call(r)))
          futures.map(_.get())
        }
        annotated ++ {
          pool.shutdown(); pool.awaitTermination(1, TimeUnit.SECONDS)
          Iterator.empty[Row]
        }
      }
    }(enc)
  }

  /** Numeric scoring on top of [[annotate]]: parses the FIRST number in
    * the model's reply into a double `score` column (null when the
    * reply has none or the request failed — the audit column tells
    * which). The parse is a codegen regexp over the already-annotated
    * frame, not more network.
    */
  def llmScore(
      df: DataFrame, textCol: String, promptTemplate: String,
      config: LlmAnnotateConfig,
  ): DataFrame =
    annotate(df, textCol, promptTemplate, config)
      .withColumn("score",
        when(col("annotation").isNull, lit(null))
          .otherwise(nullif(
            regexp_extract(col("annotation"), "-?\\d+(?:\\.\\d+)?", 0), lit("")))
          .cast("double"))

  /** Structured extraction on top of [[annotate]]: parses the model's
    * reply as a JSON object into a typed `extracted` struct column
    * (Spark's `from_json`, codegen — no second network pass). Replies
    * that are not valid JSON for `schema` leave a null struct with the
    * raw reply still in `annotation`, so extraction failures are
    * auditable data like request failures. Models often wrap JSON in
    * markdown fences — the parse strips a leading/trailing ``` fence
    * line pair before from_json (the one reply dialect worth
    * normalizing; anything else is the model's problem, visible in the
    * audit columns).
    *
    * @param schema the expected object type, e.g.
    *               `StructType.fromDDL("title string, score double")`
    */
  def llmExtract(
      df: DataFrame, textCol: String, promptTemplate: String,
      schema: org.apache.spark.sql.types.StructType,
      config: LlmAnnotateConfig,
  ): DataFrame = {
    val unfenced = regexp_replace(
      regexp_replace(col("annotation"), "(?s)^\\s*```[a-zA-Z]*\\s*", ""),
      "(?s)\\s*```\\s*$", "")
    annotate(df, textCol, promptTemplate, config)
      .withColumn("extracted",
        when(col("annotation").isNull, lit(null).cast(schema))
          .otherwise(from_json(unfenced, schema)))
  }

  /** Categorical labeling on top of [[annotate]]: keeps the reply only
    * when (case-insensitively) it contains exactly one of `labels`,
    * normalized to that label; ambiguous or off-vocabulary replies get
    * a null label with the raw reply preserved in `annotation`.
    */
  def llmLabel(
      df: DataFrame, textCol: String, promptTemplate: String,
      labels: Seq[String], config: LlmAnnotateConfig,
  ): DataFrame = {
    require(labels.nonEmpty, "labels must be non-empty")
    val hits = labels.map(l =>
      when(contains(lower(col("annotation")), lit(l.toLowerCase)), lit(l)))
    val hitArr = array(hits: _*)
    annotate(df, textCol, promptTemplate, config)
      .withColumn("label",
        when(size(filter(hitArr, _.isNotNull)) === 1,
          element_at(filter(hitArr, _.isNotNull), 1)))
  }
}
