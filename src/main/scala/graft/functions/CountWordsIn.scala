package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of space-delimited tokens of `left` that belong to the
  * FOLDABLE word set `right` (array<string>) — the single-pass form of
  * Σ_w CountSubstr(padded, " w "): over a boundary-padded string every
  * ` w ` occurrence is exactly one token equal to `w`, and distinct
  * needles cannot claim the same token, so set-membership counting is
  * count-identical while scanning the haystack ONCE with a tiny codegen
  * footprint (one loop + a hash probe per token, instead of one scan
  * loop per word — 40 inlined scan loops were measured to blow past the
  * JIT method budget inside a wide projection).
  *
  * Token = maximal run of non-space bytes; membership via a HashSet of
  * UTF8String views built once from the literal (UTF8String.fromBytes
  * wraps without copying, so the probe allocates only the small view
  * object per token).
  */
case class CountWordsIn(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_count_words_in"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string haystack, got ${left.dataType.catalogString}")
    else if (!right.dataType.isInstanceOf[ArrayType] ||
      right.dataType.asInstanceOf[ArrayType].elementType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<string> word set, got ${right.dataType.catalogString}")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName word set must be foldable")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val wordSet: java.util.HashSet[UTF8String] =
    CountWordsIn.buildSet(right.eval(null).asInstanceOf[ArrayData])

  override protected def nullSafeEval(input1: Any, input2: Any): Any =
    CountWordsIn.count(input1.asInstanceOf[UTF8String], wordSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", wordSet,
      classOf[java.util.HashSet[UTF8String]].getName)
    nullSafeCodeGen(ctx, ev, (s, _) =>
      s"${ev.value} = graft.functions.CountWordsIn.count($s, $setRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountWordsIn =
    copy(left = newLeft, right = newRight)
}

object CountWordsIn {
  def buildSet(arr: ArrayData): java.util.HashSet[UTF8String] = {
    val set = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i)
      if (s != null) set.add(s.clone())
      i += 1
    }
    set
  }

  /** Single pass: tokens are maximal non-space byte runs; each is probed
    * against the set via a no-copy UTF8String view. */
  def count(hay: UTF8String, set: java.util.HashSet[UTF8String]): Long = {
    val b = hay.getBytes
    var c = 0L
    var i = 0
    val n = b.length
    while (i < n) {
      while (i < n && b(i) == ' ') i += 1
      val start = i
      while (i < n && b(i) != ' ') i += 1
      if (i > start && set.contains(UTF8String.fromBytes(b, start, i - start))) c += 1
    }
    c
  }
}
