package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The script-aware canonical tokenizer as ONE single-pass native
  * expression: lowercase, strip everything outside [a-z0-9] ∪ the
  * segmented scripts, segment the spaceless scripts (Han, Hiragana,
  * Katakana, Thai, Lao, Khmer, Myanmar, Tibetan) one token per
  * CODEPOINT, split on ASCII whitespace, drop empty tokens.
  *
  * Value-identical to the three-regex spelling
  * `filter(split(regexp_replace(lower(trim(regexp_replace(text,
  * "([seg])", " $1 "))), "[^a-z0-9\s seg]", ""), "\s+"), _ != "")`
  * that [[graft.pipeline.Dedup.segTokensOf]] previously compiled to —
  * SegTokensSpec pins the equality exhaustively (fixtures + a
  * generator sweep over mixed scripts, special-casing letters,
  * supplementary planes). The fusion exists because the regex form
  * pays three full NFA passes per evaluation and every token surface
  * of a composed pipeline re-pays them (~×1.2–1.5 cpu corpus-wide,
  * r19 VERDICT "What's missing #3"); this loop touches each codepoint
  * once, allocates only the token strings, and keeps whole-stage
  * codegen (the generated code is a single static call).
  *
  * Equality notes (why the single pass is safe):
  *  - per-codepoint `Character.toLowerCase` equals full-string
  *    lowercasing AFTER the strip: the special multi-char mappings
  *    (İ → i+combining dot) only add combining marks the strip
  *    deletes, and context-sensitive forms (final sigma) differ only
  *    on codepoints outside the keep classes;
  *  - stripped codepoints JOIN adjacent runs (they are removed, not
  *    replaced by spaces) — only ASCII whitespace (Java regex `\s`:
  *    space, tab, LF, VT, FF, CR) and segmented-script codepoints
  *    flush the current token;
  *  - segmentation before/after lowercasing is indistinguishable: the
  *    segmented scripts are caseless and no codepoint lowercases INTO
  *    them.
  */
case class SegTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_seg_tokens"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    SegTokens.tokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.SegTokens.tokens($s);")

  override protected def withNewChildInternal(newChild: Expression): SegTokens =
    copy(child = newChild)
}

/** The PRESERVE-TEXT sibling of [[SegTokens]]: segmented whitespace
  * split — tokens are maximal runs of non-whitespace codepoints kept
  * VERBATIM (case, punctuation, every script), except segmented-script
  * codepoints become single-codepoint tokens. Value-identical to
  * `filter(split(trim(segmentScripts(text)), "\s+"), _ != "")` (the
  * spelling the chunking/packing budgets ran — SegTokensSpec pins it).
  * This is the tokenizer for surfaces whose OUTPUT must reassemble the
  * original text (chunk_text, packed sequences): counting is
  * script-aware while the emitted text keeps its source bytes.
  */
case class SegSplit(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_seg_split"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    SegTokens.splitVerbatim(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.SegTokens.splitVerbatim($s);")

  override protected def withNewChildInternal(newChild: Expression): SegSplit =
    copy(child = newChild)
}

/** The LATIN-ONLY canonical tokenizer as one single-pass native
  * expression: lowercase, strip everything outside [a-z0-9], split on
  * ASCII whitespace, drop empty tokens. Value-identical to
  * `filter(split(regexp_replace(lower(trim(text)), "[^a-z0-9\s]", ""),
  * "\s+"), _ != "")` — the `Dedup.rawTokens` + drop-"" composition
  * every Latin-tuned corpus surface (BM25 index builds, shingles, LM
  * scoring, TF-IDF) evaluates per row; SegTokensSpec pins the
  * equality on the same fixture + generator sweep as [[SegTokens]].
  * The regex form pays two NFA passes plus a split per evaluation —
  * on the index-build surfaces that regex was the dominant per-row
  * cost. NOTE: deliberately NOT script-aware (it deletes non-Latin
  * codepoints, exactly like the regex) — the multilingual surfaces
  * use [[SegTokens]]; this twin exists so the Latin-tuned operators
  * keep their published semantics at native speed.
  */
case class RawTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_raw_tokens"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    SegTokens.latinTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.SegTokens.latinTokens($s);")

  override protected def withNewChildInternal(newChild: Expression): RawTokens =
    copy(child = newChild)
}

object SegTokens {

  /** Is `cp` in a segmented (spaceless) script? Mirrors the Java regex
    * class `\p{IsHan}…\p{IsTibetan}` exactly — `\p{IsXxx}` is the
    * script property, i.e. [[Character.UnicodeScript.of]]. The range
    * test short-circuits the script lookup for every codepoint below
    * U+0E00 (Thai, the lowest block) — the SegGuard argument. */
  private def isSegScript(cp: Int): Boolean = {
    if (cp < 0x0E00) return false
    import Character.UnicodeScript._
    Character.UnicodeScript.of(cp) match {
      case HAN | HIRAGANA | KATAKANA | THAI | LAO |
           KHMER | MYANMAR | TIBETAN => true
      case _ => false
    }
  }

  /** One pass over the codepoints; see the class doc for the equality
    * argument. Never returns null elements or "" tokens. */
  def tokens(text: UTF8String): GenericArrayData = {
    val s = text.toString
    val n = s.length
    val out = new java.util.ArrayList[AnyRef]()
    val sb = new java.lang.StringBuilder()
    def flush(): Unit =
      if (sb.length > 0) {
        out.add(UTF8String.fromString(sb.toString))
        sb.setLength(0)
      }
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      val lc = Character.toLowerCase(cp)
      if ((lc >= 'a' && lc <= 'z') || (lc >= '0' && lc <= '9')) {
        sb.appendCodePoint(lc)
      } else if (isSegScript(cp)) {
        flush()
        out.add(UTF8String.fromString(new String(Character.toChars(cp))))
      } else if (cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
        cp == '\f' || cp == '\r') {
        flush()
      } // else: stripped — joins adjacent runs, exactly like the regex
      i += Character.charCount(cp)
    }
    flush()
    new GenericArrayData(out.toArray)
  }

  /** One pass for [[RawTokens]] — [[tokens]] without the
    * segmented-script branch (those codepoints are stripped, joining
    * adjacent runs, exactly like the `[^a-z0-9\s]` regex). Never
    * returns null elements or "" tokens. */
  def latinTokens(text: UTF8String): GenericArrayData = {
    val s = text.toString
    val n = s.length
    val out = new java.util.ArrayList[AnyRef]()
    val sb = new java.lang.StringBuilder()
    def flush(): Unit =
      if (sb.length > 0) {
        out.add(UTF8String.fromString(sb.toString))
        sb.setLength(0)
      }
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      val lc = Character.toLowerCase(cp)
      if ((lc >= 'a' && lc <= 'z') || (lc >= '0' && lc <= '9')) {
        sb.appendCodePoint(lc)
      } else if (cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
        cp == '\f' || cp == '\r') {
        flush()
      } // else: stripped — joins adjacent runs, exactly like the regex
      i += Character.charCount(cp)
    }
    flush()
    new GenericArrayData(out.toArray)
  }

  /** One pass for [[SegSplit]]: runs of non-whitespace kept verbatim,
    * segmented-script codepoints as single tokens. Whitespace = Java
    * regex `\s` (space, tab, LF, VT, FF, CR — ASCII only; NBSP etc.
    * stay INSIDE tokens, exactly like the regex split). Never returns
    * null elements or "" tokens. */
  def splitVerbatim(text: UTF8String): GenericArrayData = {
    val s = text.toString
    val n = s.length
    val out = new java.util.ArrayList[AnyRef]()
    var start = -1 // current run's start char index, -1 = no open run
    def flush(end: Int): Unit =
      if (start >= 0) {
        out.add(UTF8String.fromString(s.substring(start, end)))
        start = -1
      }
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      val w = Character.charCount(cp)
      if (cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
        cp == '\f' || cp == '\r') {
        flush(i)
      } else if (isSegScript(cp)) {
        flush(i)
        out.add(UTF8String.fromString(s.substring(i, i + w)))
      } else if (start < 0) {
        start = i
      }
      i += w
    }
    flush(n)
    new GenericArrayData(out.toArray)
  }
}
