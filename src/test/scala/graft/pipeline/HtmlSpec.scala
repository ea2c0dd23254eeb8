package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** HTML → text extraction contracts ([[Html.toText]]): block drops,
  * chrome drops, block-close newlines, entity decode order, whitespace
  * discipline, and graceful degradation on malformed markup.
  */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): String =
    Seq(Tuple1(html)).toDF("h")
      .select(Html.toText(col("h"))).as[String].head()

  test("script/style/head/chrome blocks drop whole; blocks become lines") {
    val html =
      """<html><head><title>T</title><style>p { color: red }</style></head>
        |<body><nav>Home | About</nav>
        |<h1>Heading</h1>
        |<script type="text/javascript">if (a < b) { alert("x") }</script>
        |<p>First para.</p><p>Second para.</p>
        |<ul><li>one</li><li>two</li></ul>
        |<footer>© chrome</footer></body></html>""".stripMargin
    val out = extract(html)
    assert(out == "Heading\nFirst para.\nSecond para.\none\ntwo",
      s"got ${out.replace("\n", "\\n")}")
    assert(!out.contains("alert") && !out.contains("color") &&
      !out.contains("Home") && !out.contains("chrome"))
  }

  test("entity decode: fixed order, &amp; last, unknown entities pass through") {
    assert(extract("<p>a &lt;b&gt; &quot;c&quot; &#39;d&#39; e&nbsp;f &amp; g</p>")
      == "a <b> \"c\" 'd' e f & g")
    // one-level decode: &amp;lt; means the four characters "&lt;"
    assert(extract("<p>&amp;lt;literal&amp;gt;</p>") == "&lt;literal&gt;")
    // entities outside the prose set stay put (not a full HTML5 table)
    assert(extract("<p>&copy; &hellip;</p>") == "&copy; &hellip;")
  }

  test("br/hr break lines; comments drop; whitespace collapses") {
    assert(extract("<p>a<br>b<br/>c<hr>d</p>") == "a\nb\nc\nd")
    assert(extract("<div>x <!-- hidden\nstuff --> y</div>") == "x y")
    assert(extract("<p>a   b\t\tc</p>\n\n\n\n<p>d</p>") == "a b c\nd")
  }

  test("malformed markup degrades, never throws") {
    // unclosed < with no later > stays literal
    assert(extract("money 5 < 6 and that is all") == "money 5 < 6 and that is all")
    // unterminated script at EOF: the block regex needs its close tag,
    // so the open tag is stripped as a plain tag and the body remains —
    // degraded, deterministic, engine-replayable
    assert(extract("<p>keep</p><script>var x = 1")
      == "keep\nvar x = 1")
    assert(extract("") == "")
  }

  test("null propagates") {
    val out = Seq(Tuple1(null: String)).toDF("h")
      .select(Html.toText(col("h"))).collect().head
    assert(out.isNullAt(0))
  }

  test("lineFeatures: link chars survive tag stripping, per-line densities") {
    val html = "<html><body>" +
      "<nav><a href=\"/\">Home</a> <a href=\"/a\">About</a></nav>" + // chrome: dropped whole
      "<p>Links: <a href=\"/1\">one link</a> and <a href=\"/2\">two</a></p>" +
      "<p>the plain prose line is here with it all and that is fine</p>" +
      "<p>Copyright 2024 MegaCorp</p>" +
      "</body></html>"
    val lf = Html.lineFeatures(Seq((1L, html)).toDF("doc_id", "h"), "doc_id", "h")
      .orderBy("pos").collect()
    assert(lf.length == 3, s"nav dropped, three <p> lines: ${lf.mkString("|")}")
    val linkLine = lf(0)
    assert(linkLine.getAs[String]("line") == "Links: one link and two")
    assert(linkLine.getAs[Long]("link_chars") == "one link".length + "two".length)
    assert(linkLine.getAs[Double]("link_density") ==
      math.rint(11.0 / 23.0 * 1e6) / 1e6)
    val prose = lf(1)
    assert(prose.getAs[Long]("link_chars") == 0L)
    assert(prose.getAs[Long]("stop_hits") >= 5L) // the,is,with,it,and,that,is
    val copyright = lf(2)
    assert(copyright.getAs[Long]("n_words") == 3L &&
      copyright.getAs[Long]("stop_hits") == 0L)
  }

  test("extractMainText keeps prose, drops link farms and chrome-ish lines") {
    val html = "<html><body>" +
      "<p><a href=\"/1\">one link</a> <a href=\"/2\">two link</a> <a href=\"/3\">x</a></p>" +
      "<p>the plain prose line is here with it all and that is fine</p>" +
      "<p>Copyright 2024 MegaCorp</p>" +
      "<p>Read <a href=\"/m\">more</a> about the thing that we have here with it</p>" +
      "</body></html>"
    val out = Html.extractMainText(Seq((7L, html)).toDF("doc_id", "h"),
      "doc_id", "h").collect().head
    assert(out.getAs[Long]("n_lines") == 4L)
    assert(out.getAs[Long]("n_lines_kept") == 2L)
    assert(out.getAs[String]("text_main") ==
      "the plain prose line is here with it all and that is fine\n" +
        "Read more about the thing that we have here with it")
  }
}
