package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Vector dot product as a native codegen'd expression:
  * Σ (double)a(i) · (double)b(i), left to right — bit-identical to the
  * former `aggregate(zip_with(a, b, _*_), 0.0, _+_)` formulation, which
  * is what every ANN oracle replays (DuckDB `list_dot_product`).
  *
  * Why native: higher-order array lambdas (ZipWith/ArrayAggregate) are
  * interpreted, allocate an intermediate array per row, and fall out of
  * whole-stage codegen — per-row cost that multiplies by pair count in
  * the similarity joins (a within-cell dedup join evaluates one dot per
  * candidate PAIR). This compiles to a tight primitive loop over the
  * two ArrayData buffers: no allocation, no virtual calls, stays inside
  * the surrounding WholeStageCodegen span.
  *
  * Null semantics match the lambda version it replaces: null array →
  * null; mismatched lengths → null (zip_with pads with null and the sum
  * poisons); null element → null. Element types may be float or double
  * independently per side.
  */
case class DotProd(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType | IntegerType | LongType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double|int|bigint> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lt = elemType(left).get
    val rt = elemType(right).get
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += DotProd.get(x, i, lt) * DotProd.get(y, i, rt)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      def get(arr: String, side: Expression): String = elemType(side).get match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case IntegerType => s"(double) $arr.getInt($i)"
        case LongType => s"(double) $arr.getLong($i)"
        case _ => s"$arr.getDouble($i)"
      }
      val lNullable = left.dataType.asInstanceOf[ArrayType].containsNull
      val rNullable = right.dataType.asInstanceOf[ArrayType].containsNull
      val elemNullCheck =
        if (lNullable || rNullable)
          s"""if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"""
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $elemNullCheck
         |    $acc += ${get(a, left)} * ${get(b, right)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProd =
    copy(left = newLeft, right = newRight)
}

object DotProd {
  private[functions] def get(a: ArrayData, i: Int, t: DataType): Double =
    t match {
      case FloatType => a.getFloat(i).toDouble
      case IntegerType => a.getInt(i).toDouble
      case LongType => a.getLong(i).toDouble
      case _ => a.getDouble(i)
    }
}
