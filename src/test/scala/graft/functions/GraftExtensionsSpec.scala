package graft.functions

import org.apache.spark.sql.SparkSession

import graft.SparkSpec

/** Exercises the `spark.sql.extensions` path end to end: a session built
  * WITH the extensions (new SparkSession over the shared context —
  * getOrCreate only applies extensions when it constructs one, hence the
  * clear/restore dance) must resolve every graft function from pure SQL
  * with no imperative ensureRegistered call.
  */
class GraftExtensionsSpec extends SparkSpec {

  private def withExtensionSession[A](f: SparkSession => A): A = {
    val shared = spark // force init of the suite-wide session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      try f(s)
      finally s.catalog.clearCache()
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }

  test("pure-SQL session resolves graft_fnv1a64 via extensions") {
    val h = withExtensionSession(
      _.sql("SELECT graft_fnv1a64('abc') AS h").head().getLong(0))
    assert(h === Fnv1a64.hash("abc".getBytes("UTF-8")))
  }

  test("the KMV aggregate works from SQL GROUP BY") {
    val rows = withExtensionSession(
      _.sql("""SELECT g, graft_kmv_kmins(h, 2) AS m
               FROM VALUES ('a', 5L), ('a', 1L), ('a', 3L), ('b', 9L) AS t(g, h)
               GROUP BY g ORDER BY g""").collect())
    assert(rows(0).getSeq[Long](1) === Seq(1L, 3L))
    assert(rows(1).getSeq[Long](1) === Seq(9L))
  }

  test("scalar functions compose in SQL expressions") {
    val n = withExtensionSession(
      _.sql("SELECT graft_count_substr('aaaa', 'aa') AS n").head().getLong(0))
    assert(n === 2L)
  }

  test("unicode normalization resolves from SQL with a foldable form") {
    val s = withExtensionSession(
      _.sql("SELECT graft_unicode_normalize('ﬁle', 'NFKC') AS s")
        .head().getString(0))
    assert(s === "file")
  }

  test("extensions and ensureRegistered register identical builders") {
    // the shared session uses the imperative path; values must agree
    GraftFunctions.ensureRegistered(spark)
    val viaShared = spark.sql("SELECT graft_fnv1a64('xyz')").head().getLong(0)
    val viaExt = withExtensionSession(
      _.sql("SELECT graft_fnv1a64('xyz')").head().getLong(0))
    assert(viaShared === viaExt)
  }
}
