package graft.sources

import org.apache.spark.sql.types._
import graft.{SparkSpec, Tables}

class ExcelSpec extends SparkSpec {
  import spark.implicits._

  private val tmp = "/root/repo/target/graft-tmp"

  test("roundtrip: nation table survives write → read with inferred types") {
    new java.io.File(tmp).mkdirs()
    val path = s"$tmp/nation-spec.xlsx"
    val nation = Tables.load(spark, sf, "nation")
    Excel.write(nation, path)
    val back = Excel.read(spark, path)
    assert(back.schema("n_nationkey").dataType == LongType)
    assert(back.schema("n_name").dataType == StringType)
    assert(back.count() == nation.count())
    def keys(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.orderBy("n_nationkey").collect()
        .map(_.getAs[Number]("n_nationkey").longValue()).toSeq
    assert(keys(back) == keys(nation))
    assert(back.where($"n_nationkey" === 0).head().getAs[String]("n_name") ==
      nation.where($"n_nationkey" === 0).head().getAs[String]("n_name"))
  }

  test("write streams rows: a multi-partition frame round-trips in order") {
    // the bounded-driver contract: rows reach the zip through
    // toLocalIterator partition by partition, and the worksheet
    // preserves the frame's row order across partition boundaries
    val path = s"$tmp/streamed-spec.xlsx"
    val df = spark.range(0, 1000).repartition(7)
      .orderBy("id")
      .selectExpr("id", "concat('name_', id) AS name")
    Excel.write(df, path)
    val back = Excel.read(spark, path).collect()
    assert(back.length == 1000)
    assert(back.map(_.getAs[Number]("id").longValue()).toSeq == (0L until 1000L))
    assert(back(17).getAs[String]("name") == "name_17")
  }

  test("mixed types: doubles, booleans, nulls, unicode, xml-escapes") {
    val path = s"$tmp/mixed-spec.xlsx"
    val df = Seq(
      (1L, Some(1.5), Some(true), Some("plain")),
      (2L, Some(-2.25), Some(false), Some("<tag> & \"quote\"")),
      (3L, None: Option[Double], None: Option[Boolean], Some("ünïcödé ✓")),
      (4L, Some(3.0), Some(true), None: Option[String]),
    ).toDF("id", "d", "b", "s")
    Excel.write(df, path)
    val back = Excel.read(spark, path)
    assert(back.schema("id").dataType == LongType)
    assert(back.schema("d").dataType == DoubleType) // -2.25 forces double
    assert(back.schema("b").dataType == BooleanType)
    assert(back.schema("s").dataType == StringType)
    val rows = back.orderBy("id").collect()
    assert(rows(1).getAs[String]("s") == "<tag> & \"quote\"")
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2))
    assert(rows(2).getAs[String]("s") == "ünïcödé ✓")
    assert(rows(3).isNullAt(3))
    assert(rows(0).getAs[Double]("d") == 1.5)
  }

  test("multi-sheet: write N sheets, read back by index, name, and all") {
    val path = s"$tmp/multi-spec.xlsx"
    val nation = Tables.load(spark, sf, "nation")
    val region = Tables.load(spark, sf, "region")
    Excel.writeSheets(Seq("nations" -> nation, "regions" -> region), path)

    assert(Excel.sheetNames(path) == Seq("nations", "regions"))
    // default read = first sheet, unchanged by the multi-sheet support
    assert(Excel.read(spark, path).count() == nation.count())
    assert(Excel.readSheet(spark, path, 1).count() == region.count())
    assert(Excel.readSheet(spark, path, "regions").columns.toSeq ==
      region.columns.toSeq)
    val all = Excel.readAll(spark, path)
    assert(all.map(_._1) == Seq("nations", "regions"))
    assert(all.toMap.apply("nations").count() == nation.count())
    val e = intercept[IllegalArgumentException](
      Excel.readSheet(spark, path, "nope"))
    assert(e.getMessage.contains("no sheet named"))
    val e2 = intercept[IllegalArgumentException](
      Excel.readSheet(spark, path, 2))
    assert(e2.getMessage.contains("out of range"))
  }

  test("large integers roundtrip exactly (no double truncation)") {
    val path = s"$tmp/bigint-spec.xlsx"
    val big = 9007199254740993L // 2^53 + 1: not representable as a double
    Seq((big, "a"), (-big, "b")).toDF("id", "s").tap(Excel.write(_, path))
    val back = Excel.read(spark, path)
    assert(back.schema("id").dataType == LongType)
    assert(back.orderBy($"id".desc).collect().map(_.getLong(0)).toSeq ==
      Seq(big, -big))
  }

  test("header=false yields positional columns; empty strings stay strings") {
    val path = s"$tmp/noheader-spec.xlsx"
    Seq(("x", 1L), ("y", 2L)).toDF("a", "b").tap(Excel.write(_, path))
    val back = Excel.read(spark, path, header = false)
    assert(back.columns.toSeq == Seq("_c0", "_c1"))
    assert(back.count() == 3) // header row read as data
  }

  implicit class Tap[A](a: A) {
    def tap(f: A => Unit): A = { f(a); a }
  }
}
