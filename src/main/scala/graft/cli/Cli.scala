package graft.cli

import java.io.BufferedReader
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import graft.schema.{SemanticSchema, SourceDef}

/** `pai`-style command line (reference: pandasai/cli/main.py:1-134).
  *
  * `dataset create` walks the reference's guided prompts and writes
  * `datasets/<org>/<dataset>/schema.yaml`; `dataset list` enumerates the
  * store; `login <key>` validates the API-key format and persists it to
  * `.env`. Creation only authors schema.yaml — no Spark session is
  * touched; loading happens later through `Engine.load`, exactly as the
  * reference CLI defers all reading to `DatasetLoader`.
  *
  * Beyond the reference's mysql/postgres choice, the source-type prompt
  * also accepts csv/parquet (a file-path prompt instead of connection
  * params), so local datasets can be onboarded from the CLI too.
  *
  * I/O is injected (`in` reader, `echo` sink, `root` dir) so specs can
  * script a whole session; `main` wires stdin/stdout/cwd.
  */
object Cli {

  /** reference: helpers/path.py:50-55 validate_name_format */
  private val namePattern = "^[a-z0-9]+(?:-[a-z0-9]+)*$".r
  /** reference: cli/main.py:17-19 validate_api_key */
  private val apiKeyPattern =
    "^PAI-[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$".r

  private val localTypes = Set("csv", "parquet")
  private val remoteTypes = Set("mysql", "postgres")

  def main(args: Array[String]): Unit = {
    val in = new BufferedReader(new java.io.InputStreamReader(System.in))
    val code = run(args.toSeq, in, println(_), Paths.get("."))
    if (code != 0) sys.exit(code)
  }

  /** Dispatch one invocation; returns a process exit code. */
  def run(args: Seq[String], in: BufferedReader, echo: String => Unit, root: Path): Int =
    args match {
      case Seq("dataset", "create")  => datasetCreate(in, echo, root)
      case Seq("dataset", "list")    => datasetList(echo, root)
      case Seq("login", apiKey)      => login(apiKey, echo, root)
      case Seq()                     => usage(echo); 1
      case other =>
        echo(s"❌ Unknown command: ${other.mkString(" ")}")
        usage(echo)
        1
    }

  private def usage(echo: String => Unit): Unit = {
    echo("🐼 Graft CLI - Manage your datasets with ease")
    echo("  dataset create   🎨 Create a new dataset through a guided process")
    echo("  dataset list     📊 List datasets in the store")
    echo("  login <api-key>  🔑 Authenticate with your API key")
  }

  /** reference: helpers/path.py:71-91 get_validated_dataset_path */
  def validatedDatasetPath(path: String): Either[String, (String, String)] =
    path.split("/", -1) match {
      case parts if parts.length != 2 =>
        Left("Path must be in format 'organization/dataset'")
      case Array(org, name) if org.isEmpty || name.isEmpty =>
        Left("Both organization and dataset names are required")
      case Array(org, _) if namePattern.findFirstIn(org).isEmpty =>
        Left("Organization name must be lowercase and use hyphens instead of spaces (e.g. 'my-org')")
      case Array(_, name) if namePattern.findFirstIn(name).isEmpty =>
        Left("Dataset path name must be lowercase and use hyphens instead of spaces (e.g. 'my-dataset')")
      case Array(org, name) => Right((org, name))
    }

  /** click.prompt equivalent: empty input takes the default; without a
    * default, re-prompts until non-empty. A `None` readLine (stream
    * exhausted) takes the default or aborts the command. */
  private def prompt(in: BufferedReader, echo: String => Unit, text: String,
      default: Option[String] = None): Option[String] = {
    val suffix = default.fold("")(d => if (d.isEmpty) "" else s" [$d]")
    var answer: Option[String] = None
    var done = false
    while (!done) {
      echo(s"$text$suffix: ")
      Option(in.readLine()).map(_.trim) match {
        case None        => answer = default; done = true
        case Some("")    => if (default.isDefined) { answer = default; done = true }
        case Some(value) => answer = Some(value); done = true
      }
    }
    answer
  }

  private def promptInt(in: BufferedReader, echo: String => Unit, text: String): Option[Int] = {
    var result: Option[Int] = None
    var open = true
    while (open) {
      prompt(in, echo, text) match {
        case None => open = false
        case Some(v) => v.toIntOption match {
          case Some(n) => result = Some(n); open = false
          case None    => echo(s"❌ Error: $v is not a valid integer")
        }
      }
    }
    result
  }

  private def promptChoice(in: BufferedReader, echo: String => Unit, text: String,
      choices: Seq[String], default: String): Option[String] = {
    var result: Option[String] = None
    var open = true
    while (open) {
      prompt(in, echo, s"$text (${choices.mkString("/")})", Some(default)) match {
        case None => open = false
        case Some(v) if choices.contains(v) => result = Some(v); open = false
        case Some(v) => echo(s"❌ Error: invalid choice: $v. (choose from ${choices.mkString(", ")})")
      }
    }
    result
  }

  /** reference: cli/main.py:33-100 dataset create */
  private def datasetCreate(in: BufferedReader, echo: String => Unit, root: Path): Int = {
    echo("🚀 Let's create a new dataset!\n")

    // loop until a valid org/dataset path (cli/main.py:38-44)
    var parsed: Option[(String, (String, String))] = None
    while (parsed.isEmpty) {
      prompt(in, echo, "📁 Enter the dataset path (format: organization/dataset)") match {
        case None => return 1
        case Some(p) => validatedDatasetPath(p) match {
          case Right(orgName) => parsed = Some((p, orgName))
          case Left(err)      => echo(s"❌ Error: $err")
        }
      }
    }
    val (path, (org, datasetName)) = parsed.get
    val dir = root.resolve("datasets").resolve(org).resolve(datasetName)

    if (Files.exists(dir.resolve("schema.yaml"))) {
      echo(s"❌ Error: Dataset already exists at path: $path")
      return 1
    }

    val name = prompt(in, echo, "📝 Enter dataset name", Some(datasetName)).getOrElse(return 1)
    val description = prompt(in, echo, "📋 Enter dataset description", Some("")).getOrElse("")
    val sourceType = promptChoice(in, echo, "🔌 Enter source type",
      (localTypes ++ remoteTypes).toSeq.sorted, default = "mysql").getOrElse(return 1)

    val source =
      if (localTypes.contains(sourceType)) {
        val file = prompt(in, echo, "📄 Enter the data file path").getOrElse(return 1)
        SourceDef(sourceType, path = Some(file))
      } else {
        val table = prompt(in, echo, "📦 Enter table name").getOrElse(return 1)
        val connection = Map(
          "host" -> prompt(in, echo, "🌐 Enter host", Some("localhost")).getOrElse(return 1),
          "port" -> promptInt(in, echo, "🔍 Enter port").getOrElse(return 1).toString,
          "database" -> prompt(in, echo, "💾 Enter database name").getOrElse(return 1),
          "user" -> prompt(in, echo, "👤 Enter username").getOrElse(return 1),
          "password" -> prompt(in, echo, "🔑 Enter password").getOrElse(return 1),
        )
        SourceDef(sourceType, table = Some(table), connection = connection)
      }

    val schema =
      try SemanticSchema(
        name = name,
        description = Some(description).filter(_.nonEmpty),
        source = Some(source),
      ).validate()
      catch {
        case e: IllegalArgumentException =>
          echo(s"❌ Error: ${e.getMessage}")
          return 1
      }

    Files.createDirectories(dir)
    Files.writeString(dir.resolve("schema.yaml"), SemanticSchema.toYaml(schema))
    echo(s"\n✨ Dataset created successfully at: $dir")
    0
  }

  /** List every `org/dataset` carrying a schema.yaml under the store. */
  private def datasetList(echo: String => Unit, root: Path): Int = {
    val store = root.resolve("datasets")
    val found =
      if (!Files.isDirectory(store)) Seq.empty
      else Files.list(store).iterator().asScala.filter(Files.isDirectory(_)).flatMap { orgDir =>
        Files.list(orgDir).iterator().asScala
          .filter(d => Files.exists(d.resolve("schema.yaml")))
          .map(d => s"${orgDir.getFileName}/${d.getFileName}")
      }.toSeq.sorted
    if (found.isEmpty) echo("No datasets found")
    else found.foreach(echo)
    0
  }

  /** reference: cli/main.py:103-130 login */
  private def login(apiKey: String, echo: String => Unit, root: Path): Int = {
    if (apiKeyPattern.findFirstIn(apiKey).isEmpty) {
      echo("❌ Invalid API key format. Expected format: PAI-xxxxxxxx-xxxx-xxxx-xxxx-xxxxxxxxxxxx")
      return 1
    }
    val envPath = root.resolve(".env")
    val kept =
      if (Files.exists(envPath))
        Files.readAllLines(envPath).asScala.filterNot(_.startsWith("PANDABI_API_KEY=")).toSeq
      else Seq.empty
    val content = (kept :+ s"PANDABI_API_KEY=$apiKey").mkString("", "\n", "\n")
    Files.writeString(envPath, content)
    echo("✅ Successfully authenticated with PandaBI!")
    0
  }
}
