package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → plain-text extraction — the step that turns a crawl's raw
  * `response` payloads into the extracted text the WET layout carries
  * (what the public crawls' own WET generation does, and the first
  * stage of every HTML-corpus curation run: strip markup and chrome,
  * keep the prose).
  *
  * Design constraints, in order:
  *   1. '''Engine-replayable.''' The whole transform is a fixed chain
  *      of regex/string rewrites over Spark's codegen'd built-ins — no
  *      UDF, no DOM parser — and every pattern is RE2-compatible (no
  *      backreferences, no lookaround), so an external oracle replays
  *      the chain verbatim (p117's DuckDB oracle does exactly that).
  *   2. '''Map-only.''' One projection; composes with `Warc.read` and
  *      the curate pipeline without any extra shuffle.
  *   3. '''Honest scope.''' This is the deterministic 90% of
  *      extraction: drop non-content blocks (script/style/head +
  *      nav/aside/footer chrome), preserve block structure as
  *      newlines, strip tags, decode the entities that matter for
  *      prose, normalize whitespace. It is NOT a browser: malformed
  *      markup degrades gracefully (an unclosed `<` with no matching
  *      `>` stays literal; unknown entities pass through), and
  *      ML-style boilerplate scoring (text-density) belongs in the
  *      quality screens downstream ([[TextAnalysis]] floors, C4/Gopher
  *      rules), which run on this output.
  */
object Html {

  /** Tags whose entire element is dropped: non-content by construction
    * (code/presentation) plus page chrome. RE2 has no backreferences,
    * so each tag gets its own non-greedy block pattern.
    */
  val droppedBlocks: Seq[String] =
    Seq("script", "style", "head", "nav", "aside", "footer", "template")

  /** Tags whose CLOSE marks a block boundary → newline. */
  val blockTags: String =
    "p|div|li|ul|ol|h[1-6]|tr|table|blockquote|section|article|pre|dd|dt"

  /** The rewrite chain as (pattern, replacement) pairs, in application
    * order — public so the oracle builder emits the SAME chain in SQL.
    * All patterns carry inline `(?i)`/`(?s)` flags (RE2 and java.util
    * .regex agree on these; neither side needs engine-specific
    * options beyond global replacement).
    */
  val rewrites: Seq[(String, String)] =
    droppedBlocks.map(t => (s"(?is)<$t\\b[^>]*>.*?</$t\\s*>", " ")) ++ Seq(
      "(?s)<!--.*?-->" -> " ",                    // comments
      "(?i)<(br|hr)\\b[^>]*>" -> "\n",            // explicit line breaks
      s"(?is)</($blockTags)\\s*>" -> "\n",        // block closes
      "(?s)<[^>]*>" -> " ",                       // any remaining tag
      // entities: the prose set, fixed order, &amp; strictly LAST so
      // "&amp;lt;" decodes to "&lt;" (one level), not "<"
      "&nbsp;" -> " ",
      "&lt;" -> "<",
      "&gt;" -> ">",
      "&quot;" -> "\"",
      "&#39;" -> "'",
      "&amp;" -> "&",
      // whitespace discipline: spaces collapse, line edges trim, any
      // run of line breaks is ONE block boundary (one newline), and
      // the edges trim fully (Spark's trim() strips only spaces, so
      // the edge rule lives in the chain where both engines share it)
      "[ \\t\\f\\r]+" -> " ",
      " *\\n *" -> "\n",
      "\\n{2,}" -> "\n",
      "^\\s+|\\s+$" -> "",
    )

  /** Extract plain text from an HTML column. Null in → null out. */
  def toText(html: Column): Column =
    rewrites.foldLeft(html) { case (c, (pat, rep)) =>
      regexp_replace(c, pat, rep)
    }

  /** The same chain as a DuckDB SQL expression over `expr` — one source
    * of truth for the oracle side (regexp_replace with the 'g' option;
    * the inline flags ride in the pattern). */
  def toTextSql(expr: String): String = {
    // standard SQL string literals: only the quote needs escaping —
    // backslashes pass through verbatim to RE2 (doubling them would
    // turn \b into a literal-backslash match)
    def q(s: String) = s.replace("'", "''")
    val chained = rewrites.foldLeft(expr) { case (e, (pat, rep)) =>
      s"regexp_replace($e, '${q(pat)}', '${q(rep)}', 'g')"
    }
    s"TRIM($chained)"
  }

  // --- line-level boilerplate removal (jusText/trafilatura-style) ----
  //
  // Html.toText keeps link-farm/menu text that isn't inside a dropped
  // tag (a <p> of anchors survives the chrome drop). The public-
  // knowledge fix (Pomikálek 2011, jusText; trafilatura) is LINE-level
  // text statistics — link density, length, stopword density — and the
  // link-chars-per-line feature must be computed BEFORE tag stripping.
  // So anchors get marked with STX/ETX sentinels first, the sentinels
  // ride through the strip chain (no rewrite touches them),
  // and the per-line features read them back after the line explode.

  /** Anchor-element pattern; its inner text is what counts as "link
    * chars". Non-greedy, RE2-compatible. An unclosed `<a>` never
    * matches — its text counts as prose, the graceful degradation. */
  val anchorPattern: String = "(?is)<a\\b[^>]*>(.*?)</a\\s*>"

  /** One marked anchor span in EXTRACTED text. An anchor whose inner
    * text spans a block boundary leaves its marks on separate lines and
    * matches neither — those chars count as prose, disclosed. */
  val spanPattern: String = "\u0002[^\u0003]*\u0003"

  /** The Gopher stopword list plus the highest-frequency English
    * function words — the jusText "stop-density" signal. */
  val defaultStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with",
      "a", "in", "is", "it")

  /** [[toText]] with anchor text wrapped in STX/ETX sentinels. */
  def toTextMarked(html: Column): Column =
    toText(regexp_replace(html, anchorPattern, "\u0002$1\u0003"))

  /** DuckDB emission of [[toTextMarked]] — the one engine-specific
    * seam is the backreference spelling ($1 in java.util.regex, \1 in
    * DuckDB/RE2 replacement strings), so the marking step lives outside
    * the shared [[rewrites]] list and each side spells its own. */
  def toTextMarkedSql(expr: String): String = {
    def q(s: String) = s.replace("'", "''")
    toTextSql(
      s"regexp_replace($expr, '${q(anchorPattern)}', chr(2) || '\\1' || chr(3), 'g')")
  }

  /** Per-line boilerplate features over an HTML column: one row per
    * extracted line with the jusText signals —
    * (doc, pos, line, n_chars, n_words, link_chars, link_density,
    * stop_hits, stop_density). `line` is the CLEAN text (sentinels
    * removed); densities are rounded to 6 decimals BEFORE any
    * threshold compare so an external replay makes identical keep/drop
    * decisions on boundary lines (the house rule). Map-only until the
    * caller aggregates: explode + codegen'd regexp/translate counts,
    * no higher-order lambdas in the per-line path.
    */
  def lineFeatures(
      df: DataFrame, idCol: String, htmlCol: String,
      stopwords: Seq[String] = defaultStopwords,
  ): DataFrame = {
    require(stopwords.nonEmpty, "stopwords must be non-empty")
    val stopPat = "(?i)\\b(" + stopwords.mkString("|") + ")\\b"
    val lines = df
      .select(col(idCol).as("doc"), toTextMarked(col(htmlCol)).as("__text"))
      .select(col("doc"),
        posexplode(split(col("__text"), "\n")).as(Seq("pos", "line")))
    val stripped = regexp_replace(col("line"), spanPattern, "")
    val nPairs = regexp_count(col("line"), lit(spanPattern))
    val clean = translate(col("line"), "\u0002\u0003", "")
    lines
      .withColumn("link_chars",
        (length(col("line")) - length(stripped) - lit(2) * nPairs)
          .cast("long"))
      .withColumn("line", clean)
      .withColumn("pos", col("pos").cast("long"))
      .withColumn("n_chars", length(col("line")).cast("long"))
      .withColumn("n_words",
        size(filter(split(trim(col("line")), "\\s+"), t => t =!= ""))
          .cast("long"))
      .withColumn("stop_hits", regexp_count(col("line"), lit(stopPat)).cast("long"))
      // an empty line is all boilerplate by definition (density 1), a
      // wordless line has no stopword signal (density 0) — both drop
      .withColumn("link_density",
        when(col("n_chars") === 0, lit(1.0)).otherwise(
          round(col("link_chars").cast("double") /
            col("n_chars").cast("double"), 6)))
      .withColumn("stop_density",
        when(col("n_words") === 0, lit(0.0)).otherwise(
          round(col("stop_hits").cast("double") /
            col("n_words").cast("double"), 6)))
      .select("doc", "pos", "line", "n_chars", "n_words", "link_chars",
        "link_density", "stop_hits", "stop_density")
  }

  /** Boilerplate-screened extraction: [[lineFeatures]] + the keep gates
    * (link density ceiling, minimum words, stopword-density floor),
    * reassembled per doc in line order — the c4CleanLines idiom. A doc
    * whose every line drops still returns (with empty `text_main`):
    * dropping docs is the downstream quality screens' decision.
    *
    * @return (doc, text_main, n_lines, n_lines_kept)
    */
  def extractMainText(
      df: DataFrame, idCol: String, htmlCol: String,
      maxLinkDensity: Double = 0.4, minWords: Long = 5,
      minStopDensity: Double = 0.03,
      stopwords: Seq[String] = defaultStopwords,
  ): DataFrame = {
    val keep = col("link_density") <= maxLinkDensity &&
      col("n_words") >= minWords && col("stop_density") >= minStopDensity
    lineFeatures(df, idCol, htmlCol, stopwords)
      .withColumn("__keep", keep)
      .groupBy("doc")
      .agg(
        array_join(
          transform(
            array_sort(collect_list(
              when(col("__keep"), struct(col("pos"), col("line"))))),
            s => s.getField("line")),
          "\n").as("text_main"),
        count(lit(1)).as("n_lines"),
        sum(col("__keep").cast("long")).as("n_lines_kept"))
  }
}
