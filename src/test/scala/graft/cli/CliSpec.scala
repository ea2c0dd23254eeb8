package graft.cli

import java.io.{BufferedReader, StringReader}
import java.nio.file.{Files, Path}
import scala.collection.mutable
import graft.SparkSpec
import graft.engine.Engine

/** Scripted sessions through the CLI (reference: pandasai/cli/main.py). */
class CliSpec extends SparkSpec {

  private def session(root: Path, input: String, args: String*): (Int, Seq[String]) = {
    val out = mutable.Buffer.empty[String]
    val code = Cli.run(args, new BufferedReader(new StringReader(input)), out += _, root)
    (code, out.toSeq)
  }

  private def freshRoot(): Path = Files.createTempDirectory("graft-cli")

  test("dataset create writes schema.yaml that Engine.load reads back") {
    val root = freshRoot()
    val input = Seq(
      "acme/regions",        // dataset path
      "",                    // name (default: regions)
      "TPC-H regions",       // description
      "parquet",             // source type
      s"$sf/region.parquet", // data file path
    ).mkString("\n")
    val (code, out) = session(root, input, "dataset", "create")
    assert(code == 0)
    assert(out.exists(_.contains("✨ Dataset created successfully at")))

    val schemaFile = root.resolve("datasets/acme/regions/schema.yaml")
    assert(Files.exists(schemaFile))

    val engine = new Engine(spark, root.resolve("datasets").toString)
    val df = engine.load("acme/regions")
    assert(df.count() == 5)
    assert(df.columns.contains("r_name"))
  }

  test("dataset create re-prompts on a bad path and rejects a duplicate") {
    val root = freshRoot()
    val input = Seq(
      "JustOneSegment",      // invalid: no org
      "Bad Org/ds",          // invalid: uppercase + space
      "acme/docs",           // valid
      "", "",                // name default, empty description
      "csv",
      s"$sf/../csv/none.csv",
    ).mkString("\n")
    val (code, out) = session(root, input, "dataset", "create")
    assert(code == 0)
    assert(out.count(_.startsWith("❌ Error:")) == 2)
    assert(out.exists(_.contains("Path must be in format 'organization/dataset'")))
    assert(out.exists(_.contains("Organization name must be lowercase")))

    // second create over the same path fails like cli/main.py:52-56
    val (dupCode, dupOut) = session(root, "acme/docs\n", "dataset", "create")
    assert(dupCode == 1)
    assert(dupOut.exists(_.contains("Dataset already exists at path: acme/docs")))
  }

  test("dataset create for a sql source collects connection params") {
    val root = freshRoot()
    val input = Seq(
      "acme/orders",
      "", "",                // name default, empty description
      "mysql",
      "orders",              // table
      "db.internal",         // host
      "not-a-port",          // invalid port, re-prompted
      "3306",                // port
      "sales",               // database
      "svc",                 // user
      "hunter2",             // password
    ).mkString("\n")
    val (code, out) = session(root, input, "dataset", "create")
    assert(code == 0)
    assert(out.exists(_.contains("not-a-port is not a valid integer")))
    val yaml = Files.readString(root.resolve("datasets/acme/orders/schema.yaml"))
    assert(yaml.contains("type: mysql"))
    assert(yaml.contains("table: orders"))
    assert(yaml.contains("port: \"3306\"") || yaml.contains("port: 3306"))
    assert(yaml.contains("host: db.internal"))
  }

  test("dataset list enumerates created datasets") {
    val root = freshRoot()
    val (emptyCode, emptyOut) = session(root, "", "dataset", "list")
    assert(emptyCode == 0 && emptyOut == Seq("No datasets found"))

    session(root, s"acme/regions\n\n\nparquet\n$sf/region.parquet\n", "dataset", "create")
    session(root, s"acme/nations\n\n\nparquet\n$sf/nation.parquet\n", "dataset", "create")
    val (_, out) = session(root, "", "dataset", "list")
    assert(out == Seq("acme/nations", "acme/regions"))
  }

  test("login validates the key format and rewrites only its own .env line") {
    val root = freshRoot()
    val (badCode, badOut) = session(root, "", "login", "PAI-not-a-key")
    assert(badCode == 1)
    assert(badOut.exists(_.contains("Invalid API key format")))

    Files.writeString(root.resolve(".env"), "OTHER=keep\nPANDABI_API_KEY=PAI-old\n")
    val key = "PAI-01234567-89ab-cdef-0123-456789abcdef"
    val (code, out) = session(root, "", "login", key)
    assert(code == 0)
    assert(out.exists(_.contains("✅ Successfully authenticated")))
    val env = Files.readString(root.resolve(".env"))
    assert(env.contains("OTHER=keep"))
    assert(env.contains(s"PANDABI_API_KEY=$key"))
    assert(!env.contains("PAI-old"))
  }
}
