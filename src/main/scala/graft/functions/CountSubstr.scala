package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of non-overlapping occurrences of `right` (needle) in `left`
  * (haystack), scanning left to right — exactly the count that
  * `(length(s) - length(replace(s, n, ''))) / length(n)` produces, but
  * with ZERO allocation: the replace-and-measure form copies the whole
  * haystack per needle, which turns a 50-needle word scan into hundreds
  * of KB of garbage per row. Byte-level matching is exact for any valid
  * UTF-8 needle (UTF-8 is self-synchronizing: a byte-aligned match IS a
  * character-aligned match). An empty needle yields 0.
  */
case class CountSubstr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_count_substr"

  // AbstractDataType (and with it ExpectsInputTypes) is private[sql], so
  // the input contract is enforced directly
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override protected def nullSafeEval(input1: Any, input2: Any): Any =
    CountSubstr.count(
      input1.asInstanceOf[UTF8String].getBytes,
      input2.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, n) => {
      val sb = ctx.freshName("hay")
      val nb = ctx.freshName("needle")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("match")
      s"""
         |byte[] $sb = $s.getBytes();
         |byte[] $nb = $n.getBytes();
         |${ev.value} = 0L;
         |if ($nb.length > 0) {
         |  int $i = 0;
         |  while ($i <= $sb.length - $nb.length) {
         |    boolean $m = true;
         |    for (int $j = 0; $j < $nb.length; $j++) {
         |      if ($sb[$i + $j] != $nb[$j]) { $m = false; break; }
         |    }
         |    if ($m) { ${ev.value}++; $i += $nb.length; } else { $i++; }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountSubstr =
    copy(left = newLeft, right = newRight)
}

object CountSubstr {
  /** Reference implementation (interpreted path + tests). */
  def count(hay: Array[Byte], needle: Array[Byte]): Long = {
    if (needle.length == 0) return 0L
    var c = 0L
    var i = 0
    while (i <= hay.length - needle.length) {
      var j = 0
      var ok = true
      while (ok && j < needle.length) {
        if (hay(i + j) != needle(j)) ok = false
        j += 1
      }
      if (ok) { c += 1; i += needle.length } else i += 1
    }
    c
  }
}
