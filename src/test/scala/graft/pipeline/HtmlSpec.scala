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
}
