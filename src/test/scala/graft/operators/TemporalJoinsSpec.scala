package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asof backward: latest right row at-or-before each left ts, per key") {
    val left = Seq(
      (1L, "k1", ts("2024-01-01 10:00:00"), "e1"),
      (2L, "k1", ts("2024-01-01 12:00:00"), "e2"),
      (3L, "k2", ts("2024-01-01 11:00:00"), "e3"),
      (4L, "k3", ts("2024-01-01 11:00:00"), "e4"), // key with no right rows
    ).toDF("id", "k", "t", "tag")
    val right = Seq(
      ("k1", ts("2024-01-01 09:00:00"), 100L),
      ("k1", ts("2024-01-01 11:30:00"), 200L),
      ("k2", ts("2024-01-01 11:00:00"), 300L), // exact-tie: inclusive
      ("k2", ts("2024-01-01 12:00:00"), 400L), // future: invisible
    ).toDF("k", "t", "rid")
    val out = AsofJoin.backward(left, right, "k", "k", "t", "t",
      Map("rid" -> "matched")).orderBy("id")
    assert(out.collect().map(r => (r.getLong(0), Option(r.get(4)))).toSeq == Seq(
      (1L, Some(100L)), (2L, Some(200L)), (3L, Some(300L)), (4L, None)))
  }

  test("asof plan: one shuffle on the key, no BroadcastNestedLoopJoin") {
    val left = Seq((1L, "k1", ts("2024-01-01 10:00:00"))).toDF("id", "k", "t")
    val right = Seq(("k1", ts("2024-01-01 09:00:00"), 9L)).toDF("k", "t", "rid")
    val plan = AsofJoin.backward(left, right, "k", "k", "t", "t",
      Map("rid" -> "m")).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("range join: inclusive bounds, each pair matched exactly once") {
    val points = Seq(0.0, 49.9, 50.0, 150.0, 250.0).toDF("p")
    val ranges = Seq((1L, 0.0, 50.0), (2L, 40.0, 160.0), (3L, 200.0, 300.0))
      .toDF("rid", "lo", "hi")
    val out = RangeJoin.pointInRange(points, "p", ranges, "lo", "hi", 100)
      .select("p", "rid").as[(Double, Long)].collect().toSet
    assert(out == Set(
      (0.0, 1L), (49.9, 1L), (50.0, 1L),       // range 1 inclusive at hi
      (49.9, 2L), (50.0, 2L), (150.0, 2L),     // range 2 spans two buckets
      (250.0, 3L)))
    val plan = RangeJoin.pointInRange(points, "p", ranges, "lo", "hi", 100)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"))
  }

  test("sessionize: strict-gap merge, session_end = last + gap") {
    val df = Seq(
      ("u1", ts("2024-01-01 10:00:00"), 1.0),
      ("u1", ts("2024-01-01 10:20:00"), 2.0), // 20 min < 30 min gap: merges
      ("u1", ts("2024-01-01 10:50:00"), 3.0), // exactly 30 min: NEW session
      ("u2", ts("2024-01-01 10:00:00"), 4.0),
    ).toDF("u", "t", "v")
    val out = Sessionize.sessions(df, "u", "t", "30 minutes",
        aggs = Seq(sum($"v").as("sv")))
      .orderBy("u", "session_start").collect()
    assert(out.map(r => (r.getString(0), r.getLong(3), r.getDouble(4))).toSeq ==
      Seq(("u1", 2L, 3.0), ("u1", 1L, 3.0), ("u2", 1L, 4.0)))
    assert(out.head.getTimestamp(1) == ts("2024-01-01 10:00:00"))
    assert(out.head.getTimestamp(2) == ts("2024-01-01 10:50:00")) // 10:20 + 30m
  }
}
