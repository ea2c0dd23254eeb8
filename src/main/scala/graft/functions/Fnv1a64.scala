package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a 64-bit string hash as a native Catalyst expression with
  * whole-stage codegen — a PORTABLE hash (the algorithm is public and
  * trivially re-implementable in any engine, unlike xxhash64's Spark-
  * specific seeding), so hash-derived operators like SimHash can be
  * verified bit-for-bit by an external oracle.
  *
  * Hashes the UTF-8 BYTES of the input, like every standard FNV-1a
  * implementation; the result is the signed-long view of the unsigned
  * 64-bit FNV value.
  */
case class Fnv1a64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fnv1a64"

  // AbstractDataType (and with it ExpectsInputTypes) is private[sql], so
  // the input contract is enforced directly
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    Fnv1a64.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |${ev.value} = 0xcbf29ce484222325L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  ${ev.value} = (${ev.value} ^ ($bytes[$i] & 0xffL)) * 0x100000001b3L;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Fnv1a64 =
    copy(child = newChild)
}

object Fnv1a64 {
  /** Reference implementation (interpreted path + tests). */
  def hash(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    h
  }
}

/** Registration + Column-level entry points for graft's native
  * expressions. `call_function` resolves through the session's function
  * registry, so registration is per-session and idempotent.
  */
object GraftFunctions {
  val FnvName = "graft_fnv1a64"
  val CountSubstrName = "graft_count_substr"
  val CountWordsInName = "graft_count_words_in"
  val MaxDotName = "graft_max_dot"
  val KmvName = "graft_kmv_kmins"
  val DotName = "graft_dot"
  val CmsName = "graft_cms"
  val BloomBitsName = "graft_bloom_bits"
  val UnicodeNormalizeName = "graft_unicode_normalize"
  val SegTokensName = "graft_seg_tokens"
  val SegSplitName = "graft_seg_split"
  val RawTokensName = "graft_raw_tokens"

  // idempotent PER FUNCTION: each name gets its own exists-check, so a
  // registry that predates a later-added function still picks the new
  // one up. (A single guard keyed on the first name silently skipped
  // every function added after it — a session registered before the
  // addition failed later with an opaque 'Undefined function'.) The
  // exists-check, not createOrReplace-always, is what keeps a session
  // from logging one "replaced a previously registered function" WARN
  // per function per query.
  private def registerIfAbsent(spark: SparkSession, name: String)(
      builder: Seq[Expression] => Expression): Unit = {
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
  }

  private def requireArity(name: String, exprs: Seq[Expression], n: Int): Unit =
    if (exprs.length != n) throw new IllegalArgumentException(
      s"$name expects exactly $n argument${if (n == 1) "" else "s"}, got ${exprs.length}")

  /** The single builder table both registration paths share —
    * [[ensureRegistered]] (imperative, per-session) and
    * [[GraftExtensions]] (declarative, `spark.sql.extensions`) — so the
    * two can never drift. */
  private[functions] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    FnvName -> { exprs =>
      requireArity(FnvName, exprs, 1)
      Fnv1a64(exprs.head)
    },
    CountSubstrName -> { exprs =>
      requireArity(CountSubstrName, exprs, 2)
      CountSubstr(exprs.head, exprs(1))
    },
    CountWordsInName -> { exprs =>
      requireArity(CountWordsInName, exprs, 2)
      CountWordsIn(exprs.head, exprs(1))
    },
    MaxDotName -> { exprs =>
      requireArity(MaxDotName, exprs, 2)
      // the matrix arg must be a compile-time constant (a typedlit):
      // it is folded into the expression ONCE here, not evaluated per row
      val litE = exprs(1)
      if (!litE.foldable) throw new IllegalArgumentException(
        s"$MaxDotName's second argument (the matrix) must be foldable")
      val ad = litE.eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val matrix = Array.tabulate(ad.numElements())(i =>
        ad.getArray(i).toDoubleArray())
      MaxDotStatic(exprs.head, matrix)
    },
    KmvName -> { exprs =>
      requireArity(KmvName, exprs, 2)
      val kE = exprs(1)
      if (!kE.foldable) throw new IllegalArgumentException(
        s"$KmvName's second argument (k) must be foldable")
      KmvKMins(exprs.head, kE.eval(null).asInstanceOf[Number].intValue())
        .toAggregateExpression()
    },
    DotName -> { exprs =>
      requireArity(DotName, exprs, 2)
      DotProd(exprs.head, exprs(1))
    },
    CmsName -> { exprs =>
      requireArity(CmsName, exprs, 3)
      def foldInt(e: Expression, what: String): Int = {
        if (!e.foldable) throw new IllegalArgumentException(
          s"$CmsName's $what argument must be foldable")
        e.eval(null).asInstanceOf[Number].intValue()
      }
      CmsSketch(exprs.head, foldInt(exprs(1), "depth"), foldInt(exprs(2), "width"))
        .toAggregateExpression()
    },
    BloomBitsName -> { exprs =>
      requireArity(BloomBitsName, exprs, 2)
      val bitsE = exprs(1)
      if (!bitsE.foldable) throw new IllegalArgumentException(
        s"$BloomBitsName's second argument (numBits) must be foldable")
      BloomBits(exprs.head, bitsE.eval(null).asInstanceOf[Number].intValue())
        .toAggregateExpression()
    },
    UnicodeNormalizeName -> { exprs =>
      requireArity(UnicodeNormalizeName, exprs, 2)
      val formE = exprs(1)
      if (!formE.foldable) throw new IllegalArgumentException(
        s"$UnicodeNormalizeName's second argument (the form) must be foldable")
      UnicodeNormalize(exprs.head, UnicodeNormalize.formOf(
        formE.eval(null).toString))
    },
    SegTokensName -> { exprs =>
      requireArity(SegTokensName, exprs, 1)
      SegTokens(exprs.head)
    },
    SegSplitName -> { exprs =>
      requireArity(SegSplitName, exprs, 1)
      SegSplit(exprs.head)
    },
    RawTokensName -> { exprs =>
      requireArity(RawTokensName, exprs, 1)
      RawTokens(exprs.head)
    },
  )

  def ensureRegistered(spark: SparkSession): Unit =
    builders.foreach { case (name, b) => registerIfAbsent(spark, name)(b) }

  /** FNV-1a 64 of a string column. [[ensureRegistered]] must have been
    * called on the owning session. */
  def fnv1a64(c: Column): Column = call_function(FnvName, c)

  /** Non-overlapping substring occurrence count — see [[CountSubstr]].
    * [[ensureRegistered]] must have been called on the owning session. */
  def countSubstr(hay: Column, needle: Column): Column =
    call_function(CountSubstrName, hay, needle)

  /** Single-pass space-token set-membership count — see [[CountWordsIn]].
    * [[ensureRegistered]] must have been called on the owning session. */
  def countWordsIn(hay: Column, words: Seq[String]): Column =
    call_function(CountWordsInName, hay,
      org.apache.spark.sql.functions.array(
        words.map(org.apache.spark.sql.functions.lit): _*))

  /** Unicode normalization of a string column — see [[UnicodeNormalize]].
    * `form` ∈ {NFC, NFD, NFKC, NFKD}. [[ensureRegistered]] must have been
    * called on the owning session. */
  def unicodeNormalize(c: Column, form: String): Column =
    call_function(UnicodeNormalizeName, c,
      org.apache.spark.sql.functions.lit(form))

  /** Single-pass script-aware canonical tokenizer — see [[SegTokens]].
    * [[ensureRegistered]] must have been called on the owning session. */
  def segTokens(c: Column): Column = call_function(SegTokensName, c)

  /** Single-pass preserve-text segmented whitespace split — see
    * [[SegSplit]]. [[ensureRegistered]] must have been called on the
    * owning session. */
  def segSplit(c: Column): Column = call_function(SegSplitName, c)

  /** Single-pass Latin canonical tokenizer — see [[RawTokens]].
    * [[ensureRegistered]] must have been called on the owning session. */
  def rawTokens(c: Column): Column = call_function(RawTokensName, c)

  /** Max dot product of a vector column against a fixed matrix — see
    * [[MaxDotStatic]]. [[ensureRegistered]] must have been called on the
    * owning session. */
  def maxDot(vec: Column, matrix: Seq[Seq[Double]]): Column =
    call_function(MaxDotName, vec,
      org.apache.spark.sql.functions.typedlit(matrix))

  /** KMV sketch aggregate: the k unsigned-smallest distinct values of a
    * bigint column, sorted ascending — see [[KmvKMins]].
    * [[ensureRegistered]] must have been called on the owning session. */
  def kmvKMins(hashes: Column, k: Int): Column =
    call_function(KmvName, hashes, org.apache.spark.sql.functions.lit(k))

  /** Codegen'd vector dot product — see [[DotProd]].
    * [[ensureRegistered]] must have been called on the owning session. */
  def dotProd(a: Column, b: Column): Column = call_function(DotName, a, b)

  /** Count-Min Sketch aggregate over a per-row position array — see
    * [[CmsSketch]]. [[ensureRegistered]] must have been called on the
    * owning session. */
  def cms(positions: Column, depth: Int, width: Int): Column =
    call_function(CmsName, positions,
      org.apache.spark.sql.functions.lit(depth),
      org.apache.spark.sql.functions.lit(width))

  /** Bitmap-OR aggregate over a per-row position array — see
    * [[BloomBits]]. [[ensureRegistered]] must have been called on the
    * owning session. */
  def bloomBits(positions: Column, numBits: Int): Column =
    call_function(BloomBitsName, positions,
      org.apache.spark.sql.functions.lit(numBits))
}
