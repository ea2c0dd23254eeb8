package graft.engine

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.Paginator.Params

/** Mirrors the reference's paginator unit tests
  * (tests/unit_tests/query_builders/test_paginator.py) on real frames.
  */
class PaginatorSpec extends SparkSpec {

  private lazy val users = {
    import spark.implicits._
    Seq(
      (1L, "John Smith", 25, Timestamp.valueOf("2023-01-01 12:00:00"), true, 7.5),
      (2L, "Jane Doe", 30, Timestamp.valueOf("2023-06-15 08:30:00"), false, 25.0),
      (3L, "Bob Stone", 25, Timestamp.valueOf("2023-01-01 12:00:00"), true, 3.25),
      (4L, "Alice Quartz", 41, Timestamp.valueOf("2024-02-29 23:59:59"), false, 9.0),
    ).toDF("id", "name", "age", "created_at", "is_active", "score")
  }

  test("basic pagination: 1-based page maps to LIMIT/OFFSET") {
    val page2 = Paginator.paginate(
      users, Params(page = 2, pageSize = 2, sortBy = Some("id")))
    assert(page2.select("id").collect().map(_.getLong(0)).toSeq == Seq(3L, 4L))
  }

  test("invalid page / pageSize / sortOrder are rejected (PaginationParams bounds)") {
    intercept[IllegalArgumentException](Paginator.paginate(users, Params(page = 0)))
    intercept[IllegalArgumentException](Paginator.paginate(users, Params(pageSize = 101)))
    intercept[IllegalArgumentException](Paginator.paginate(users, Params(pageSize = 0)))
    intercept[IllegalArgumentException](
      Paginator.paginate(users, Params(sortBy = Some("id"), sortOrder = "ASCENDING")))
  }

  test("SQL fragments in params are rejected (not_sql validator)") {
    val e = intercept[IllegalArgumentException](
      Paginator.paginate(users, Params(search = Some("SELECT * FROM users"))))
    assert(e.getMessage.contains("SQL queries are not allowed"))
    intercept[IllegalArgumentException](
      Paginator.paginate(users, Params(filters = Map("name" -> Seq("x WHERE 1=1")))))
  }

  test("unknown sort column is a clear error, not an analysis exception") {
    val e = intercept[IllegalArgumentException](
      Paginator.paginate(users, Params(sortBy = Some("nope"))))
    assert(e.getMessage.contains("not found in available columns"))
  }

  test("string search is case-insensitive substring (ILIKE)") {
    val hit = Paginator.paginate(users, Params(search = Some("john")))
    assert(hit.select("name").collect().map(_.getString(0)).toSeq == Seq("John Smith"))
  }

  test("numeric search: digits-only matches integer columns, float parse matches float") {
    // "25" matches age=25 rows (integer equality)...
    val n = Paginator.paginate(users, Params(search = Some("25"), sortBy = Some("id")))
    assert(n.select("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // ...and score=25.0 (row 2) via the float branch
    // signed term is NOT .isnumeric(): must not match integers, only floats
    val neg = Paginator.paginate(users, Params(search = Some("-25")))
    assert(neg.count() == 0)
  }

  test("datetime search: strict 'yyyy-MM-dd HH:mm:ss' equality on timestamp columns") {
    val hit = Paginator.paginate(
      users, Params(search = Some("2023-01-01 12:00:00"), sortBy = Some("id")))
    assert(hit.select("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
    // date-only term does not parse → timestamp column skipped, no rows
    assert(Paginator.paginate(users, Params(search = Some("2023-01-01"))).count() == 0)
  }

  test("timestamp search honors the session timezone, not the JVM default") {
    val old = java.util.TimeZone.getDefault
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("America/New_York"))
    try {
      // instants were created under the original default; the search term
      // must be interpreted in spark.sql.session.timeZone — a JVM-default
      // parse would look for an instant 5 hours away and match nothing
      val hit = Paginator.paginate(
        users, Params(search = Some("2023-01-01 12:00:00"), sortBy = Some("id")))
      assert(hit.select("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
    } finally java.util.TimeZone.setDefault(old)
  }

  test("JSON null filter values match nothing (IN (NULL) semantics)") {
    val f = Paginator.parseFilters("""{"name": null}""")
    assert(Paginator.paginate(users, Params(filters = f)).count() == 0)
  }

  test("boolean search matches boolean columns") {
    val f = Paginator.paginate(users, Params(search = Some("false"), sortBy = Some("id")))
    assert(f.select("id").collect().map(_.getLong(0)).toSeq == Seq(2L, 4L))
  }

  test("filters map to IN; JSON filters parse with scalar→singleton") {
    val in = Paginator.paginate(
      users, Params(filters = Map("age" -> Seq(25, 41)), sortBy = Some("id")))
    assert(in.select("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 3L, 4L))

    val parsed = Paginator.parseFilters("""{"age": [25, 30], "name": "Jane Doe"}""")
    assert(parsed("age") == Seq(25L, 30L))
    assert(parsed("name") == Seq("Jane Doe"))
    val viaJson = Paginator.paginate(
      users, Params(filters = Paginator.parseFilters("""{"name": "Jane Doe"}""")))
    assert(viaJson.count() == 1)

    val bad = intercept[IllegalArgumentException](Paginator.parseFilters("{nope"))
    assert(bad.getMessage.contains("Invalid filters format"))
    intercept[IllegalArgumentException](Paginator.parseFilters("[1,2]"))
  }

  test("combined search+filter+sort+page plan keeps limit/offset pushed down") {
    val q = Paginator.paginate(
      users, Params(page = 1, pageSize = 2, search = Some("o"),
        filters = Map("age" -> Seq(25, 30)), sortBy = Some("score"), sortOrder = "desc"))
    val plan = q.queryExecution.executedPlan.toString
    // sort+limit should compile to TakeOrderedAndProject, not a global sort
    assert(plan.contains("TakeOrderedAndProject"))
    assert(q.count() <= 2)
  }
}
