package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native codegen
  * expression — the canonicalization step every text pipeline runs
  * before tokenization, hashing, or dedup ("café" composed and
  * decomposed must be ONE document, fullwidth "Ａ１" and "A1" one
  * token stream under the compatibility forms).
  *
  * Codegen carries an allocation-free ASCII fast path: pure-ASCII rows
  * (the overwhelming majority of crawl bytes) return the input
  * UTF8String untouched — no String materialization, no normalizer
  * call — checked with one byte scan (ASCII is normalized under every
  * form). Non-ASCII rows take `Normalizer.isNormalized` (cheap verify,
  * still no output allocation) before paying for an actual normalize.
  */
case class UnicodeNormalize(child: Expression, form: Normalizer.Form)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_unicode_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    if (UnicodeNormalize.isAscii(u)) u
    else {
      val s = u.toString
      if (Normalizer.isNormalized(s, form)) u
      else UTF8String.fromString(Normalizer.normalize(s, form))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val formRef = ctx.addReferenceObj("form", form, "java.text.Normalizer.Form")
      val i = ctx.freshName("i")
      val ascii = ctx.freshName("ascii")
      val s = ctx.freshName("str")
      s"""
         |boolean $ascii = true;
         |for (int $i = 0; $i < $c.numBytes(); $i++) {
         |  if ($c.getByte($i) < 0) { $ascii = false; break; }
         |}
         |if ($ascii) {
         |  ${ev.value} = $c;
         |} else {
         |  String $s = $c.toString();
         |  ${ev.value} = java.text.Normalizer.isNormalized($s, $formRef)
         |    ? $c
         |    : org.apache.spark.unsafe.types.UTF8String.fromString(
         |        java.text.Normalizer.normalize($s, $formRef));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  private[functions] def isAscii(u: UTF8String): Boolean = {
    var i = 0
    while (i < u.numBytes()) {
      if (u.getByte(i) < 0) return false
      i += 1
    }
    true
  }

  def formOf(name: String): Normalizer.Form = name.toUpperCase match {
    case "NFC"  => Normalizer.Form.NFC
    case "NFD"  => Normalizer.Form.NFD
    case "NFKC" => Normalizer.Form.NFKC
    case "NFKD" => Normalizer.Form.NFKD
    case other  => throw new IllegalArgumentException(
      s"unknown normalization form '$other' (want NFC/NFD/NFKC/NFKD)")
  }
}
