package graft.api

import org.apache.spark.sql.DataFrame
import graft.agent.{Agent, Llm, Memory}
import graft.engine.Engine
import graft.response.Response

/** v2-API compatibility shims (reference:
  * pandasai/smart_dataframe/__init__.py:1-225,
  * pandasai/smart_datalake/__init__.py:1-168): construction emits the
  * reference's deprecation banner, then everything delegates to a fresh
  * [[graft.agent.Agent]] over just the wrapped frame(s) — the same
  * "Agent([dfs], config)" delegation the reference shims perform.
  *
  * The banner goes through [[SmartCompat.warn]] (default: stderr) so
  * migrating users see it once per construction and tests can capture it.
  */
object SmartCompat {
  /** Deprecation sink; replace in tests to capture the banner. */
  @volatile var warn: String => Unit = Console.err.println(_)

  private val stars = "*" * 80

  private[api] def deprecationBanner(message: String): String =
    s"\n$stars\nDEPRECATION WARNING:\n$message\n$stars\n"

  /** Records the last prompt handed to the LLM, the shims' `last_prompt`
    * property (smart_dataframe/__init__.py:117-119). */
  private[api] final class RecordingLlm(underlying: Llm) extends Llm {
    @volatile var lastPrompt: Option[String] = None
    override def generate(prompt: String): String = {
      lastPrompt = Some(prompt)
      underlying.generate(prompt)
    }
  }
}

/** reference: smart_dataframe/__init__.py:16-205. */
@deprecated("SmartDataframe will soon be deprecated. Please use df.chat() instead.", "3.0")
final class SmartDataframe(
    val dataframe: DataFrame,
    name: Option[String] = None,
    description: Option[String] = None,
    customHead: Option[DataFrame] = None,
)(llm: Llm, datasetsRoot: String = "datasets", maxRetries: Int = 3) {

  SmartCompat.warn(SmartCompat.deprecationBanner(
    "SmartDataframe will soon be deprecated. Please use df.chat() instead."))

  val tableName: String = name.getOrElse("df")
  val tableDescription: Option[String] = description

  private val recording = new SmartCompat.RecordingLlm(llm)
  private val engine = new Engine(dataframe.sparkSession, datasetsRoot)
  engine.register(tableName, dataframe)
  private val agent = new Agent(engine, recording, maxRetries, description)

  /** smart_dataframe/__init__.py:74-93 */
  def chat(query: String, outputType: Option[String] = None): Response =
    agent.chat(query, outputType)

  /** head_df / head_csv (:95-114); `customHead` overrides like the
    * reference's custom_head. */
  def headDf: DataFrame = customHead.getOrElse(dataframe.limit(5))
  def headCsv: String = {
    val head = headDf
    val header = head.columns.mkString(",")
    val rows = head.collect().map(_.toSeq.map { v =>
      val s = String.valueOf(v)
      if (s.contains(",") || s.contains("\"") || s.contains("\n"))
        "\"" + s.replace("\"", "\"\"") + "\""
      else s
    }.mkString(","))
    (header +: rows).mkString("", "\n", "\n")
  }

  def lastPrompt: Option[String] = recording.lastPrompt
  /** last_code_generated: the SQL the agent last produced (:123-125). */
  def lastCodeGenerated: Option[String] =
    agent.memory.toMessages.reverse.find(_.role == "assistant").map(_.content)

  /** __len__ (:196-197) */
  def count(): Long = dataframe.count()
}

/** reference: smart_datalake/__init__.py:14-168. */
@deprecated("SmartDatalake will be deprecated soon. Use df.chat() instead.", "3.0")
final class SmartDatalake(
    dfs: Seq[(String, DataFrame)],
)(llm: Llm, datasetsRoot: String = "datasets", maxRetries: Int = 3) {

  require(dfs.nonEmpty, "SmartDatalake needs at least one dataframe")

  SmartCompat.warn(SmartCompat.deprecationBanner(
    "SmartDatalake will be deprecated soon. Use df.chat() instead."))

  private val recording = new SmartCompat.RecordingLlm(llm)
  private val engine = new Engine(dfs.head._2.sparkSession, datasetsRoot)
  dfs.foreach { case (n, df) => engine.register(n, df) }
  private val agent = new Agent(engine, recording, maxRetries)

  /** smart_datalake/__init__.py:48-70 */
  def chat(query: String, outputType: Option[String] = None): Response =
    agent.chat(query, outputType)

  /** clear_memory (:72-76) */
  def clearMemory(): Unit = agent.memory.clear()

  def memory: Memory = agent.memory
  def lastPrompt: Option[String] = recording.lastPrompt
  def lastCodeGenerated: Option[String] =
    agent.memory.toMessages.reverse.find(_.role == "assistant").map(_.content)
}
