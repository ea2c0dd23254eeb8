package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.Similarity

class DotProdSpec extends SparkSpec {
  import spark.implicits._

  private def lambdaDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("bit-identical to the lambda formulation it replaces (float)") {
    val df = (1 to 200).map { i =>
      (Seq.tabulate(64)(j => (i * 31 + j).toFloat / 7f),
        Seq.tabulate(64)(j => (i * 17 + j * 3).toFloat / 11f))
    }.toDF("a", "b")
    val rows = df.select(
      Similarity.dot(col("a"), col("b")).as("native"),
      lambdaDot(col("a"), col("b")).as("lambda")).collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("mixed float/double sides") {
    val df = Seq((Seq(1f, 2f, 3f), Seq(0.5, 0.25, 2.0))).toDF("a", "b")
    assert(df.select(Similarity.dot(col("a"), col("b"))).head().getDouble(0)
      === 1 * 0.5 + 2 * 0.25 + 3 * 2.0)
  }

  test("length mismatch and null array yield null, like zip_with") {
    val df = Seq(
      (Some(Seq(1f, 2f)), Some(Seq(1f))),
      (None: Option[Seq[Float]], Some(Seq(1f)))).toDF("a", "b")
    val out = df.select(Similarity.dot(col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("interpreted eval path agrees with codegen") {
    val a = Seq(1.5f, -2f, 3f)
    val b = Seq(2f, 0.5f, -1f)
    val expected = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    // codegen path
    val viaDf = Seq((a, b)).toDF("a", "b")
      .select(Similarity.dot(col("a"), col("b"))).head().getDouble(0)
    assert(viaDf === expected)
    // interpreted path (direct eval over catalyst values)
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val e = DotProd(
      Literal.create(ArrayData.toArrayData(a.toArray), ArrayType(FloatType, false)),
      Literal.create(ArrayData.toArrayData(b.toArray), ArrayType(FloatType, false)))
    assert(e.eval(null) === expected)
  }

  test("norm is sqrt of self-dot") {
    val df = Seq(Tuple1(Seq(3f, 4f))).toDF("a")
    assert(df.select(Similarity.norm(col("a"))).head().getDouble(0) === 5.0)
  }
}
