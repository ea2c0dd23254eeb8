package graft.pipeline

import graft.SparkSpec

/** Profiling contracts: type votes count what they should, nulls are
  * coverage (not errors), distincts exclude nulls, extrema are
  * lexicographic, and the empty frame yields zero-count rows per
  * column rather than a crash.
  */
class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    ("1", "2.5", "2024-01-31", "a"),
    ("-7", "bad", "not a date", null),
    ("3x", "-0.25", "2023-12-01x", "a"),
    (null, "10", null, "b"),
  ).toDF("ints", "floats", "dates", "cats")

  private lazy val prof = Profiling.profileColumns(
    df, Seq("ints", "floats", "dates", "cats"))
    .collect()
    .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6), r.getString(7), r.getString(8)))
    .toMap

  test("type votes: ints/floats/dates counted on non-null values only") {
    assert(prof("ints") == ((4L, 1L, 2L, 0L, 0L, 3L, "-7", "3x")))
    // "10" is int-like, not float-like; "-0.25" is float-like
    assert(prof("floats")._3 == 1L && prof("floats")._4 == 2L)
    // prefix match: "2023-12-01x" still date-SHAPED (leading pattern)
    assert(prof("dates")._5 == 2L)
  }

  test("distincts exclude nulls; extrema are lexicographic") {
    assert(prof("cats") == ((4L, 1L, 0L, 0L, 0L, 2L, "a", "b")))
  }

  test("empty frame: one zero-count row per requested column") {
    val empty = Seq.empty[(String, String)].toDF("a", "b")
    val rows = Profiling.profileColumns(empty, Seq("a", "b")).collect()
    assert(rows.isEmpty, "no input rows → no groups (callers union the column list)")
  }

  test("schemaDiff: added/removed/type-changed/unchanged columns") {
    val old = Seq((1L, "a", 1.0)).toDF("id", "keep", "becomes_int")
    val cur = Seq((1L, "a", 2, true)).toDF("id", "keep", "becomes_int", "fresh")
    val m = Profiling.schemaDiff(old, cur)
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2), r.getString(3)))
      .toMap
    assert(m("id") == (("bigint", "bigint", "unchanged")))
    assert(m("keep") == (("string", "string", "unchanged")))
    assert(m("becomes_int") == (("double", "int", "type_changed")))
    assert(m("fresh") == ((null, "boolean", "added")))
    val back = Profiling.schemaDiff(cur, old)
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(back("fresh") == "removed")
  }

  test("approx mode returns the same shape with a sane estimate") {
    val big = (0 until 1000).map(i => Tuple1(s"v${i % 137}")).toDF("c")
    val r = Profiling.profileColumns(big, Seq("c"), exact = false).collect().head
    assert(math.abs(r.getLong(6) - 137L) < 14, s"HLL estimate off: ${r.getLong(6)}")
  }

  test("concentration: gini and top-share on hand-computable distributions") {
    def card(counts: Seq[Int]): (Long, Long, Double, Double) = {
      val rows = counts.zipWithIndex.flatMap { case (c, k) =>
        Seq.fill(c)(s"k$k") }
      Profiling.concentration(rows.map(Tuple1(_)).toDF("key"), "key")
        .as[(Long, Long, Double, Double)].head()
    }
    // counts {1, 3}: mean abs diff 1, mean 2 → gini 0.25
    assert(card(Seq(1, 3)) == ((2L, 4L, 0.75, 0.25)))
    // perfectly uniform → gini 0
    assert(card(Seq(5, 5, 5, 5)) == ((4L, 20L, 0.25, 0.0)))
    // one key holds everything → top_share 1, gini 0 (one key = no spread)
    assert(card(Seq(7)) == ((1L, 7L, 1.0, 0.0)))
    // heavy skew {1,1,1,1,16}: pairwise diff sum per ordered pairs:
    // gini = sum f*(k*Fb - Sb) / (nk*n) = 1*(16*4-4) / (5*20) = 0.6
    assert(card(Seq(1, 1, 1, 1, 16)) == ((5L, 20L, 0.8, 0.6)))
    // partitioning-invariant
    val df = (1 to 300).map(i => Tuple1(s"h${i % 7}")).toDF("key")
    assert(Profiling.concentration(df, "key").head() ==
      Profiling.concentration(df.repartition(11), "key").head())
  }
}
