package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KmvKMinsSpec extends SparkSpec {
  import spark.implicits._

  private def kmins(values: Seq[Long], k: Int, parts: Int = 4): Seq[Long] = {
    GraftFunctions.ensureRegistered(spark)
    values.toDF("h").repartition(parts)
      .agg(GraftFunctions.kmvKMins(col("h"), k).as("m"))
      .head().getSeq[Long](0)
  }

  test("keeps the k smallest distinct values, sorted") {
    assert(kmins(Seq(5L, 3L, 9L, 1L, 7L), 3) === Seq(1L, 3L, 5L))
  }

  test("deduplicates before ranking") {
    assert(kmins(Seq(2L, 2L, 2L, 8L, 8L, 4L), 3) === Seq(2L, 4L, 8L))
  }

  test("unsigned order: negative longs rank above all positives") {
    // -1 = 0xFFFF… is the LARGEST unsigned value
    assert(kmins(Seq(-1L, 0L, 1L, Long.MinValue), 3) ===
      Seq(0L, 1L, Long.MinValue))
  }

  test("under-filled sketch returns all distinct values") {
    assert(kmins(Seq(10L, 20L), 5) === Seq(10L, 20L))
  }

  test("merge across partitions matches single-partition result") {
    val vals = (1L to 1000L).map(v => v * 2654435761L) // scrambled
    assert(kmins(vals, 16, parts = 8) === kmins(vals, 16, parts = 1))
  }

  test("groupBy strata keeps sketches independent") {
    GraftFunctions.ensureRegistered(spark)
    val df = Seq(("a", 1L), ("a", 2L), ("b", 100L), ("b", 200L))
      .toDF("s", "h")
    val out = df.groupBy("s")
      .agg(GraftFunctions.kmvKMins(col("h"), 8).as("m"))
      .orderBy("s").as[(String, Seq[Long])].collect()
    assert(out === Array(("a", Seq(1L, 2L)), ("b", Seq(100L, 200L))))
  }

  test("nulls are ignored") {
    GraftFunctions.ensureRegistered(spark)
    val out = Seq(Some(3L), None, Some(1L)).toDF("h")
      .agg(GraftFunctions.kmvKMins(col("h"), 4).as("m"))
      .head().getSeq[Long](0)
    assert(out === Seq(1L, 3L))
  }
}
