package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.agent.{Agent, AgentLogger, FakeLlm, Llm}
import graft.engine.{Engine, SqlGate}
import graft.response.Response
import graft.schema.SourceDef

/** Top-level facade mirroring the reference's module API — `pai.config.set`,
  * `pai.create/load/read_csv`, `df.chat(...)` (reference:
  * pandasai/__init__.py:46-321, dataframe/base.py:100-118) — so a
  * reference user maps 1:1 onto this library:
  *
  * {{{
  * Graft.configure(spark, llm)
  * val sales = Graft.readCsv("data/sales.csv")
  * import Graft.ChatOps
  * sales.chat("top 3 regions by revenue")          // Response
  * Graft.create("org/sales", sales)
  * val ds = Graft.load("org/sales")
  * Graft.chat("compare sales and costs", sales, costs)
  * }}}
  */
object Graft {

  @volatile private var state: Option[(Engine, Agent)] = None

  /** `llm` is deliberately required (no FakeLlm default): a forgotten LLM
    * would silently answer every chat with canned results that look real.
    * Tests that want canned answers pass `new FakeLlm(...)` explicitly.
    */
  /** `saveLogs`/`verbose`/`maxRetries` mirror the reference's global
    * Config (pandasai/config.py:10-16); activity goes to `logPath`
    * (the reference's pandasai.log analogue) when saveLogs is true. */
  def configure(
      spark: SparkSession,
      llm: Llm,
      datasetsRoot: String = "datasets",
      maxRetries: Int = 3,
      description: Option[String] = None,
      saveLogs: Boolean = false,
      verbose: Boolean = false,
      logPath: String = "graft.log",
  ): Engine = synchronized {
    val engine = new Engine(spark, datasetsRoot)
    val logger =
      if (saveLogs || verbose) Some(new AgentLogger(saveLogs, verbose, logPath))
      else None
    state = Some((engine,
      new Agent(engine, llm, maxRetries, description, logger = logger)))
    engine
  }

  def engine: Engine = state.map(_._1).getOrElse(
    throw new IllegalStateException("call Graft.configure(spark, llm) first"))
  private def agent: Agent = state.map(_._2).getOrElse(
    throw new IllegalStateException("call Graft.configure(spark, llm) first"))

  /** `pai.read_csv`: eager-named, lazy-planned CSV table; table name
    * derives from the file name (reference: pandasai/__init__.py:294-298). */
  def readCsv(path: String): DataFrame = {
    val df = engine.spark.read
      .option("header", "true").option("inferSchema", "true").csv(path)
    engine.register(SqlGate.sanitizeFileName(path), df)
    df
  }

  /** `pai.read_excel` with the default `sheet_name=0`: first sheet →
    * DataFrame with header + type inference (reference:
    * pandasai/__init__.py:300-318; see graft.sources.Excel for the
    * engine and its roundtrip contract). */
  def readExcel(path: String, header: Boolean = true): DataFrame =
    graft.sources.Excel.read(engine.spark, path, header)

  /** `pai.read_excel(path, sheet_name=<int|str>)`: one named/indexed
    * sheet. */
  def readExcel(path: String, sheet: Int): DataFrame =
    graft.sources.Excel.readSheet(engine.spark, path, sheet)

  def readExcel(path: String, sheet: String): DataFrame =
    graft.sources.Excel.readSheet(engine.spark, path, sheet)

  /** `pai.read_excel(path, sheet_name=None)`: ALL sheets as an ordered
    * (sheetName → frame) map; each frame is also registered under the
    * reference's sanitized `file_sheet` table name
    * (pandasai/__init__.py:311-318), so L2 SQL can join across sheets. */
  def readExcelAll(path: String, header: Boolean = true): Seq[(String, DataFrame)] = {
    val frames = graft.sources.Excel.readAll(engine.spark, path, header)
    frames.foreach { case (sheet, df) =>
      engine.register(s"${SqlGate.sanitizeFileName(path)}_$sheet", df)
    }
    frames
  }

  def create(path: String, df: DataFrame, description: Option[String] = None): DataFrame =
    engine.create(path, df, description)

  def load(path: String): DataFrame = engine.load(path)

  /** `pai.chat(query, *dfs)`: register the frames, enforce the source-
    * compatibility check (reference: agent/base.py:74-79 — mixing source
    * families in one conversation is rejected), then run the loop.
    * Starts a NEW conversation — the reference builds a fresh Agent per
    * chat() call (pandasai/__init__.py:219-236), so prior memory is
    * cleared; continue an existing one with [[followUp]]. */
  def chat(question: String, dfs: (String, DataFrame)*): Response = {
    require(dfs.nonEmpty || engine.knownTables.nonEmpty,
      "chat needs at least one table")
    dfs.foreach { case (name, df) => engine.register(name, df) }
    val declaredSources = engine.knownTables.toSeq
      .flatMap(engine.schemaOf).flatMap(_.source)
    require(checkCompatibleSources(declaredSources),
      "cannot mix tables from incompatible sources in one query " +
        s"(families: ${declaredSources.map(_.stype).distinct.mkString(", ")})")
    agent.memory.clear()
    agent.chat(question)
  }

  /** Follow-up on the running conversation; errors when none exists
    * (reference: pandasai/__init__.py:239-256 raises on no conversation;
    * `outputType` per agent.follow_up(query, output_type)). */
  def followUp(question: String, outputType: Option[String] = None): Response = {
    if (agent.memory.count == 0)
      throw new IllegalStateException(
        "No existing conversation. Please use chat() to start a new conversation.")
    agent.chat(question, outputType)
  }

  /** `df.chat(...)` extension, the reference's main entry point. */
  implicit final class ChatOps(private val df: DataFrame) extends AnyVal {
    def chat(question: String, name: String = "df"): Response =
      Graft.chat(question, name -> df)
  }

  /** Sources are mixable in one query only within the same family
    * (reference: Agent source-compatibility check, agent/base.py:74-79 and
    * base_query_builder.py check_compatible_sources). Local files are one
    * family; each remote connection is its own. */
  def checkCompatibleSources(sources: Seq[SourceDef]): Boolean =
    sources.map(family).distinct.size <= 1

  private def family(s: SourceDef): String =
    if (SourceDef.localTypes.contains(s.stype)) "local"
    else s"${s.stype}:${s.connection.getOrElse("host", "")}:${s.connection.getOrElse("database", "")}"
}
