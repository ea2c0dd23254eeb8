package graft.transform

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.schema.TransformDef

class TransformationsSpec extends SparkSpec {
  import spark.implicits._

  private val noTables: String => org.apache.spark.sql.DataFrame =
    n => fail(s"unexpected table resolve: $n")

  private def applyT(df: org.apache.spark.sql.DataFrame, colName: String,
      ts: TransformDef*): org.apache.spark.sql.DataFrame = {
    val (d2, e) = Transformations.applyColumn(df, colName, col(colName), ts, noTables)
    d2.select(e.as(colName))
  }

  test("anonymize is md5 of the string form") {
    val out = applyT(Seq("alice").toDF("name"), "name",
      TransformDef("anonymize", Map("column" -> "name"))).head().getString(0)
    assert(out == "6384e2b2184bcbf58eccf10ca7a6563c") // md5("alice")
  }

  test("fill_na / ensure_positive / clip null behavior") {
    val df = Seq[(java.lang.Integer, java.lang.Double)]((1, -5.0), (2, null), (3, 12.0))
      .toDF("id", "v")
    val filled = applyT(df, "v", TransformDef("fill_na", Map("column" -> "v", "value" -> 0.0)))
      .as[Double].collect()
    assert(filled.toSeq == Seq(-5.0, 0.0, 12.0))
    val pos = applyT(df, "v", TransformDef("ensure_positive", Map("column" -> "v")))
      .collect().map(r => Option(r.get(0)))
    assert(pos.toSeq == Seq(None, None, Some(12.0)))
    val clipped = applyT(df, "v", TransformDef("clip",
      Map("column" -> "v", "lower" -> 0, "upper" -> 10)))
      .collect().map(r => Option(r.get(0)))
    // least/greatest SKIP nulls in both Spark and DuckDB — a null input
    // clamps to the lower bound, matching the reference's emitted SQL
    assert(clipped.toSeq == Seq(Some(0.0), Some(0.0), Some(10.0)))
  }

  test("chaining applies in declaration order (sql_transformation_manager.py:40-45)") {
    val df = Seq("  Hello  ").toDF("s")
    // strip → lowercase ≠ lowercase → truncate(3); order must be declared order
    val a = applyT(df, "s",
      TransformDef("strip", Map("column" -> "s")),
      TransformDef("truncate", Map("column" -> "s", "length" -> 3))).head().getString(0)
    assert(a == "Hel")
    val b = applyT(df, "s",
      TransformDef("truncate", Map("column" -> "s", "length" -> 3)),
      TransformDef("strip", Map("column" -> "s"))).head().getString(0)
    assert(b == "H")
  }

  test("column matching is case-insensitive (sql_transformation_manager.py:249-269)") {
    val ts = Seq(TransformDef("to_uppercase", Map("column" -> "NaMe")))
    assert(Transformations.forColumn("name", ts).nonEmpty)
    assert(Transformations.forColumn("other", ts).isEmpty)
  }

  test("map_values only rewrites matched keys") {
    val df = Seq("a", "b", "z").toDF("v")
    val out = applyT(df, "v", TransformDef("map_values",
      Map("column" -> "v", "mapping" -> Map("a" -> "A", "b" -> "B"))))
      .as[String].collect()
    assert(out.toSeq == Seq("A", "B", "z"))
  }

  test("bin labels + out-of-range falls through to the raw value as string") {
    val df = Seq(5.0, 25.0, 99.0).toDF("v")
    val out = applyT(df, "v", TransformDef("bin", Map("column" -> "v",
      "bins" -> Seq(0, 10, 50), "labels" -> Seq("lo", "hi"))))
      .as[String].collect()
    assert(out.toSeq == Seq("lo", "hi", "99.0"))
    intercept[IllegalArgumentException] {
      applyT(df, "v", TransformDef("bin", Map("column" -> "v",
        "bins" -> Seq(0, 10), "labels" -> Seq("a", "b"))))
    }
  }

  test("extract returns NULL (not empty string) on no match — DuckDB REGEXP_SUBSTR parity") {
    val df = Seq("abc123", "nodigits").toDF("s")
    val out = applyT(df, "s", TransformDef("extract",
      Map("column" -> "s", "pattern" -> "[0-9]+")))
      .collect().map(r => Option(r.getString(0)))
    assert(out.toSeq == Seq(Some("123"), None))
  }

  test("validate_email nulls out invalid addresses") {
    val df = Seq("a@b.com", "not-an-email").toDF("e")
    val out = applyT(df, "e", TransformDef("validate_email", Map("column" -> "e")))
      .collect().map(r => Option(r.getString(0)))
    assert(out.toSeq == Seq(Some("a@b.com"), None))
  }

  test("normalize is exact min-max scaling via broadcast stats (no global window)") {
    val df = Seq(0.0, 5.0, 10.0).toDF("v")
    val (d2, e) = Transformations.applyColumn(df, "v", col("v"),
      Seq(TransformDef("normalize", Map("column" -> "v"))), noTables)
    val out = d2.select(e.as("v")).as[Double].collect().sorted
    assert(out.toSeq == Seq(0.0, 0.5, 1.0))
    // plan must not contain a Window — the two-pass broadcast shape
    assert(!d2.select(e).queryExecution.optimizedPlan.toString.contains("Window"))
  }

  test("validate_foreign_key nulls keys missing from the reference table") {
    val df = Seq(1, 2, 99).toDF("k")
    val ref = Seq(1, 2, 3).toDF("rk")
    val (d2, e) = Transformations.applyColumn(df, "k", col("k"),
      Seq(TransformDef("validate_foreign_key",
        Map("column" -> "k", "ref_table" -> "ref", "ref_column" -> "rk"))),
      _ => ref)
    val out = d2.select(e.as("k")).collect().map(r => Option(r.get(0))).toSeq
    assert(out.count(_.isDefined) == 2 && out.contains(None))
  }

  test("encode_categorical reproduces the reference's unsupported-type error (T29)") {
    val err = intercept[Transformations.UnsupportedTransformationError] {
      applyT(Seq("x").toDF("c"), "c",
        TransformDef("encode_categorical", Map("column" -> "c")))
    }
    assert(err.getMessage.contains("encode_categorical"))
  }

  test("rename target resolution") {
    val ts = Seq(TransformDef("rename", Map("column" -> "a", "new_name" -> "b")))
    assert(Transformations.renameTarget("a", ts).contains("b"))
    assert(Transformations.renameTarget("x", ts).isEmpty)
  }
}
