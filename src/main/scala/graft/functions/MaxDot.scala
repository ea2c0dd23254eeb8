package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Max dot product of a vector column against a FIXED matrix (the
  * blocklist of a semantic-decontamination screen, unit-normalized
  * driver-side): `max over rows r of Σ_i vec[i]·r[i]`, summing over the
  * shorter length when dimensions disagree.
  *
  * A native codegen'd expression because the higher-order-function
  * formulation (`array_max(transform(lits, b => dot(v, b)))`) runs
  * INTERPRETED and re-walks two 64-element folds per blocklist row per
  * corpus row — measured ~1.3s at sf0.1 where this compiles to a tight
  * B×d loop over a referenced double[][]. Null vectors yield null
  * (UnaryExpression's default null propagation); array ELEMENTS must be
  * non-null (embedding columns; enforced by the type contract of every
  * Similarity operator).
  */
case class MaxDotStatic(child: Expression, matrix: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_max_dot"

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> argument, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val vec = elemType match {
      case FloatType => arr.toFloatArray().map(_.toDouble)
      case _         => arr.toDoubleArray()
    }
    var best = Double.NegativeInfinity
    var r = 0
    while (r < matrix.length) {
      val row = matrix(r)
      val lim = math.min(vec.length, row.length)
      var s = 0.0
      var i = 0
      while (i < lim) { s += vec(i) * row(i); i += 1 }
      if (s > best) best = s
      r += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("matrix", matrix, "double[][]")
    nullSafeCodeGen(ctx, ev, c => {
      val getElem = elemType match {
        case FloatType => s"(double) $c.getFloat"
        case _         => s"$c.getDouble"
      }
      val (n, best, r, row, lim, s, i) =
        (ctx.freshName("n"), ctx.freshName("best"), ctx.freshName("r"),
          ctx.freshName("row"), ctx.freshName("lim"), ctx.freshName("s"),
          ctx.freshName("i"))
      s"""
         |int $n = $c.numElements();
         |double $best = Double.NEGATIVE_INFINITY;
         |for (int $r = 0; $r < $m.length; $r++) {
         |  double[] $row = $m[$r];
         |  int $lim = Math.min($n, $row.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $lim; $i++) {
         |    $s += $getElem($i) * $row[$i];
         |  }
         |  if ($s > $best) $best = $s;
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MaxDotStatic =
    copy(child = newChild)
}
