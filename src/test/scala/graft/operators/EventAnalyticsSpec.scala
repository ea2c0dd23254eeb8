package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Funnel and retention contracts on hand-built event streams. */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def t(d: Int, h: Int = 0) =
    Timestamp.valueOf(f"2024-03-$d%02d $h%02d:00:00")

  test("funnel: step order is enforced, not just event presence") {
    val events = Seq(
      // user 1 completes in order
      (1L, t(1), "signup"), (1L, t(2), "click"), (1L, t(3), "purchase"),
      // user 2 clicked BEFORE signing up — click must not count
      (2L, t(2), "click"), (2L, t(3), "signup"),
      // user 3 purchases before clicking — purchase must not count
      (3L, t(1), "signup"), (3L, t(2), "purchase"), (3L, t(4), "click"),
      // user 4 never signs up
      (4L, t(1), "click"), (4L, t(2), "purchase"),
    ).toDF("user_id", "ts", "event_type")
    val out = EventAnalytics.funnel(events, "user_id", "ts", "event_type",
      Seq("signup", "click", "purchase"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out == Map("signup" -> 3L, "click" -> 2L, "purchase" -> 1L), s"$out")
  }

  test("funnel: same-timestamp completion counts (at-or-after)") {
    val events = Seq((1L, t(1), "signup"), (1L, t(1), "click"))
      .toDF("user_id", "ts", "event_type")
    val out = EventAnalytics.funnel(events, "user_id", "ts", "event_type",
      Seq("signup", "click")).collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out("click") == 1L)
  }

  test("funnel: conversion fractions and empty-stream zeros") {
    val events = Seq((1L, t(1), "signup"), (2L, t(1), "signup"),
      (1L, t(2), "click")).toDF("user_id", "ts", "event_type")
    val rows = EventAnalytics.funnel(events, "user_id", "ts", "event_type",
      Seq("signup", "click")).orderBy("step_idx").collect()
    assert(rows(0).isNullAt(3), "step 0 has no previous step")
    assert(rows(1).getDouble(3) == 0.5)
    val none = EventAnalytics.funnel(
      Seq.empty[(Long, Timestamp, String)].toDF("user_id", "ts", "event_type"),
      "user_id", "ts", "event_type", Seq("signup", "click")).collect()
    assert(none.map(_.getLong(2)).toSeq == Seq(0L, 0L))
    assert(none(1).isNullAt(3), "0/0 conversion is null, not an ANSI error")
  }

  test("transitions: counts consecutive pairs per user, rows normalize") {
    val events = Seq(
      (1L, t(1), "a", 10L), (1L, t(2), "b", 11L), (1L, t(3), "a", 12L),
      (2L, t(1), "a", 20L), (2L, t(2), "b", 21L),
      // equal timestamps: order by the tie column (30 before 31)
      (3L, t(1), "b", 30L), (3L, t(1), "a", 31L),
    ).toDF("user_id", "ts", "event_type", "event_id")
    val out = EventAnalytics.eventTransitions(events, "user_id", "ts",
      "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // from a: a→b twice (users 1, 2); from b: b→a twice (user 1, user 3 tie)
    assert(out == Map(("a", "b") -> ((2L, 1.0)), ("b", "a") -> ((2L, 1.0))), s"$out")
  }

  test("retention: cohorts by first week, offsets count distinct-week activity") {
    val events = Seq(
      // cohort week of Mar 4 (Monday): users 1, 2
      (1L, t(4), "a"), (2L, t(5), "a"),
      // user 1 returns in week+1 (twice — still one active row), user 2 doesn't
      (1L, t(11), "a"), (1L, t(12), "a"),
      // cohort week of Mar 11: user 3
      (3L, t(13), "a"),
    ).toDF("user_id", "ts", "event_type")
    val out = EventAnalytics.retentionCohorts(events, "user_id", "ts", periods = 4)
      .collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(out(("2024-03-04", 0)) == ((2L, 2L, 1.0)))
    assert(out(("2024-03-04", 1)) == ((1L, 2L, 0.5)))
    assert(out(("2024-03-11", 0)) == ((1L, 1L, 1.0)))
    assert(!out.contains(("2024-03-04", 2)), "inactive offsets emit no row")
  }
}
