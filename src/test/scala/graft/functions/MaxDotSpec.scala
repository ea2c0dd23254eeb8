package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MaxDotSpec extends SparkSpec {
  import spark.implicits._

  private val matrix = Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, -1.0, 2.0))

  test("max dot against the literal matrix, float and double vectors") {
    GraftFunctions.ensureRegistered(spark)
    // float vectors (the embedding column type)
    val f = Seq((1L, Seq(2f, 3f, 1f)), (2L, Seq(-5f, 1f, 0f)))
      .toDF("id", "v")
      .select(col("id"), GraftFunctions.maxDot(col("v"), matrix).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // row dots: (2, -1): max 2 ... id1: (2.0, -3+2= -1) -> 2; id2: (-5, -1) -> -1
    assert(f(1L) == 2.0 && f(2L) == -1.0)

    // double vectors take the other codegen branch
    val d = Seq((1L, Seq(0.5, 0.5, 0.5)))
      .toDF("id", "v")
      .select(GraftFunctions.maxDot(col("v"), matrix).as("d"))
      .head().getDouble(0)
    // dots: 0.5 and (-0.5 + 1.0) = 0.5
    assert(d == 0.5)

    // interpreted path (eval) agrees with codegen
    val expr = MaxDotStatic(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(2.0, 3.0, 1.0),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      matrix.map(_.toArray).toArray)
    assert(expr.eval(null) == 2.0)
  }

  test("shorter vectors dot over the shared prefix; null vector yields null") {
    GraftFunctions.ensureRegistered(spark)
    val out = Seq((1L, Seq(4f)), (2L, null.asInstanceOf[Seq[Float]]))
      .toDF("id", "v")
      .select(col("id"), GraftFunctions.maxDot(col("v"), matrix).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out(1L) == 4.0) // rows dot over length-1 prefix: 4 and 0
    assert(out(2L) == null)
  }

  test("non-constant matrix and non-array vector are rejected") {
    GraftFunctions.ensureRegistered(spark)
    intercept[Exception] {
      Seq((Seq(1f), Seq(Seq(1.0)))).toDF("v", "m")
        .select(call_function(GraftFunctions.MaxDotName, col("v"), col("m")))
        .collect()
    }
    intercept[Exception] {
      Seq("not a vector").toDF("v")
        .select(GraftFunctions.maxDot(col("v"), matrix)).collect()
    }
  }
}
