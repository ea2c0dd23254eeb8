package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Warc

/** The archive curation loop ([[TrainingPipeline.curateArchive]]):
  * WARC response shards in → full curate → WET conversion shards +
  * manifest out, with the returned frame read back from the output.
  */
class ArchiveCurateSpec extends SparkSpec {
  import spark.implicits._

  private def sentence(tag: String): String =
    (1 to 30).map(i => s"the $tag word$i of a plain sentence").mkString(" ")

  test("curate loop: floors drop, dups collapse, WET round-trips the text") {
    val base = s"target/graft-test/archcurate_${System.nanoTime()}"
    val docs = Seq(
      1L -> sentence("alpha"),
      2L -> sentence("alpha"), // exact dup of 1 → dropped by CC dedup
      3L -> sentence("bravo"),
      4L -> "too short", // fails the word floor
      5L -> sentence("charlie"),
    ).toDF("doc_id", "text")
    Warc.writeShards(docs, "doc_id", "text", s"$base/in", shards = 2)

    val out = TrainingPipeline.curateArchive(spark, s"$base/in", s"$base/out")
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
    OperatorCache.releaseAll(spark)

    assert(rows.map(_._1).toSeq == Seq(1L, 3L, 5L),
      s"kept ${rows.map(_._1).toSeq}: dup keeps min id, floor drops 4")
    // text fidelity through WARC response in AND WET conversion out
    assert(rows.find(_._1 == 3L).get._2 == sentence("bravo"))
    assert(rows.forall(r => Set("train", "val", "test")(r._3)))

    // the published layout stands alone: WET shards parse, manifest agrees
    val wet = Warc.read(spark, s"$base/out/*.warc.wet.gz")
      .where(col("warc_type") === "conversion").count()
    assert(wet == 3)
    val mf = spark.read.parquet(s"$base/out/_manifest")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(mf == Seq(1L, 3L, 5L))
  }

  test("robotsArchive: disallowed pages never enter the corpus; other agents ignored") {
    val base = s"target/graft-test/archcurate_robots_${System.nanoTime()}"
    val docs = Seq(
      1L -> sentence("alpha"),   // path /doc/1 — disallowed for *
      12L -> sentence("bravo"),  // path /doc/12 — prefix /doc/1 matches
      3L -> sentence("charlie"), // kept
      20L -> sentence("delta"),  // kept ('/doc/2' is not a rule)
    ).toDF("doc_id", "text")
    Warc.writeShards(docs, "doc_id", "text", s"$base/in", shards = 2)
    // robots: badbot's Disallow: / must NOT apply; * disallows /doc/1
    val robots = Seq(("robots.txt",
      "User-agent: badbot\nDisallow: /\n\nUser-agent: *\nDisallow: /doc/1\n"))
      .toDF("k", "body")
    Warc.writeShards(robots, "k", "body", s"$base/robots", shards = 1,
      uriPrefix = "http://example.org/")

    val out = TrainingPipeline.curateArchive(spark, s"$base/in", s"$base/out",
      robotsArchive = Some(s"$base/robots"))
    val kept = out.select("doc_id").as[Long].collect().sorted.toSeq
    OperatorCache.releaseAll(spark)
    assert(kept == Seq(3L, 20L), s"robots must gate 1 and 12, got $kept")
    // the published WET really never carried the disallowed pages
    val wetIds = Warc.read(spark, s"$base/out/*.warc.wet.gz")
      .where(col("warc_type") === "conversion")
      .select(regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1).cast("long"))
      .as[Long].collect().sorted.toSeq
    assert(wetIds == Seq(3L, 20L), s"published shards: $wetIds")
  }

  test("extractHtml: raw pages extract before curating; WET carries prose") {
    val base = s"target/graft-test/archcurate_html_${System.nanoTime()}"
    def page(body: String) =
      s"""<html><head><style>p{x}</style></head><body><nav>Home</nav>
         |<p>$body</p><footer>fin</footer></body></html>""".stripMargin
    val docs = Seq(
      1L -> page(sentence("alpha")),
      2L -> page("too short"), // prose fails the word floor after extraction
    ).toDF("doc_id", "text")
    Warc.writeShards(docs, "doc_id", "text", s"$base/in", shards = 1)
    val out = TrainingPipeline.curateArchive(
      spark, s"$base/in", s"$base/out", extractHtml = true)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    OperatorCache.releaseAll(spark)
    assert(out.map(_._1).toSeq == Seq(1L))
    val text = out.head._2
    assert(text == sentence("alpha"),
      s"chrome and tags must be gone from the WET text: $text")
  }

  test("boilerplate flag: link-farm lines drop from the WET text, prose survives") {
    val base = s"target/graft-test/archcurate_bp_${System.nanoTime()}"
    // a page whose <p>-wrapped link farm SURVIVES plain toText (it is
    // not chrome markup) but must die to the line-level density screen
    def page(body: String) =
      "<html><head><title>t</title></head><body>" +
        "<p><a href=\"/1\">one link</a> <a href=\"/2\">two link</a> " +
        "<a href=\"/3\">three</a></p>" +
        s"<p>$body</p>" +
        "<p>Copyright 2024 MegaCorp</p>" +
        "</body></html>"
    val docs = Seq(1L -> page(sentence("alpha"))).toDF("doc_id", "text")
    Warc.writeShards(docs, "doc_id", "text", s"$base/in", shards = 1)

    val plain = TrainingPipeline.curateArchive(
      spark, s"$base/in", s"$base/plain", extractHtml = true)
      .collect().map(_.getString(1)).head
    OperatorCache.releaseAll(spark)
    assert(plain.contains("one link") && plain.contains("Copyright"),
      s"plain toText keeps the boilerplate lines (the gap): $plain")

    val screened = TrainingPipeline.curateArchive(
      spark, s"$base/in", s"$base/out", extractHtml = true,
      boilerplate = true)
      .collect().map(_.getString(1)).head
    OperatorCache.releaseAll(spark)
    assert(screened == sentence("alpha"),
      s"the line screen must keep exactly the prose line: $screened")

    // flag contract: boilerplate without extractHtml is a caller bug
    intercept[IllegalArgumentException] {
      TrainingPipeline.curateArchive(
        spark, s"$base/in", s"$base/x", boilerplate = true)
    }
  }
}
