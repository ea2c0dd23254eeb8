package graft.types

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class TypesSpec extends AnyFunSuite {

  test("strftime → java.time translation") {
    assert(Strftime.toJavaTime("%Y-%m-%d") == "yyyy-MM-dd")
    assert(Strftime.toJavaTime("%d/%m/%Y") == "dd/MM/yyyy")
    assert(Strftime.toJavaTime("%H:%M:%S") == "HH:mm:ss")
    assert(Strftime.toJavaTime("%Y-%m-%dT%H:%M:%S") == "yyyy-MM-dd'T'HH:mm:ss")
    assert(Strftime.toJavaTime("%I %p") == "hh a")
    assert(Strftime.toJavaTime("%b %e, %Y") == "MMM d, yyyy")
    assert(Strftime.toJavaTime("100%% sure %Y") == "100% 'sure' yyyy")
    // unknown directives pass through literally
    assert(Strftime.toJavaTime("%Q").contains("%"))
  }

  test("literal quoting keeps letters out of the pattern space") {
    // 'week' contains pattern letters w/e/k → must be quoted
    // week-based directives are rejected eagerly: their java.time letters
    // (Y/w/e) are banned by Spark since 3.0 and would throw at action time
    intercept[UnsupportedOperationException] {
      Strftime.toJavaTime("week %V of %Y")
    }
  }

  test("5-type mapping is total and round-trips") {
    assert(TypeMapping.toSpark("string") == StringType)
    assert(TypeMapping.toSpark("integer") == LongType)
    assert(TypeMapping.toSpark("float") == DoubleType)
    assert(TypeMapping.toSpark("datetime") == TimestampType)
    assert(TypeMapping.toSpark("boolean") == BooleanType)
    intercept[IllegalArgumentException](TypeMapping.toSpark("decimal"))
    for (t <- TypeMapping.valid)
      assert(TypeMapping.fromSpark(TypeMapping.toSpark(t)) == t)
    assert(TypeMapping.fromSpark(IntegerType) == "integer")
    assert(TypeMapping.fromSpark(DecimalType(18, 3)) == "float")
  }
}
