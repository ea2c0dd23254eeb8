package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class Fnv1a64Spec extends SparkSpec {
  import spark.implicits._

  private def viaSpark(values: Seq[String]): Seq[java.lang.Long] = {
    GraftFunctions.ensureRegistered(spark)
    values.toDF("s")
      .select(GraftFunctions.fnv1a64(col("s")).as("h"))
      .collect().map(r => if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))).toSeq
  }

  test("matches the published FNV-1a 64 test vectors") {
    // canonical vectors: fnv1a64("") = offset basis, fnv1a64("a"), ("abc")
    assert(Fnv1a64.hash("".getBytes("UTF-8")) == 0xcbf29ce484222325L)
    assert(Fnv1a64.hash("a".getBytes("UTF-8")) == 0xaf63dc4c8601ec8cL)
    assert(viaSpark(Seq("", "a", "abc")) ==
      Seq(0xcbf29ce484222325L, 0xaf63dc4c8601ec8cL,
        Fnv1a64.hash("abc".getBytes("UTF-8"))))
  }

  test("codegen path equals the interpreted reference on varied inputs") {
    val inputs = Seq("hello world", "ünïcödé ✓", "0123456789" * 20, " ", "\t\n")
    assert(viaSpark(inputs) ==
      inputs.map(s => java.lang.Long.valueOf(Fnv1a64.hash(s.getBytes("UTF-8")))))
  }

  test("null input yields null; non-string input is rejected at analysis") {
    assert(viaSpark(Seq(null)) == Seq(null))
    GraftFunctions.ensureRegistered(spark)
    intercept[Exception] {
      Seq(1L).toDF("n").select(GraftFunctions.fnv1a64(col("n"))).collect()
    }
  }

  test("ensureRegistered repairs a registry that has only SOME of the functions") {
    // the upgrade scenario: a session registered before a function was
    // added to the library has the old names but not the new one. A
    // single guard keyed on the first name skipped the whole block and
    // the new function failed later with an opaque 'Undefined function';
    // each name must be checked-and-registered individually.
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    val registry = spark.sessionState.functionRegistry
    GraftFunctions.ensureRegistered(spark)
    val all = Seq(GraftFunctions.FnvName, GraftFunctions.CountSubstrName,
      GraftFunctions.CountWordsInName, GraftFunctions.MaxDotName)
    all.foreach(n => assert(registry.functionExists(FunctionIdentifier(n)), n))
    // simulate the stale registry: the FIRST name present, a later one gone
    registry.dropFunction(FunctionIdentifier(GraftFunctions.MaxDotName))
    assert(!registry.functionExists(FunctionIdentifier(GraftFunctions.MaxDotName)))
    GraftFunctions.ensureRegistered(spark)
    all.foreach(n => assert(registry.functionExists(FunctionIdentifier(n)),
      s"$n missing after re-registration over a partial registry"))
  }
}
