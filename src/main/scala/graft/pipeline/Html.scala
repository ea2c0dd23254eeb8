package graft.pipeline

import org.apache.spark.sql.Column
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
}
