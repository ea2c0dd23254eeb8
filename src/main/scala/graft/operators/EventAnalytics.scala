package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classic event-analytics operators Spark has no built-ins for:
  * ordered-step funnels and first-seen retention cohorts. Both are
  * key-shuffle-bounded: every aggregate and join runs on the user key,
  * so AQE plans the whole chain on one co-partitioned family.
  */
object EventAnalytics {

  /** Ordered-step funnel: step 0 is a user's first `steps(0)` event;
    * step i is their first `steps(i)` event AT OR AFTER their step-(i−1)
    * time. The returned card has one row per step with the user count
    * and the conversion fraction from the previous step (null for
    * step 0).
    *
    * Shape: one conditional min-aggregate per step over the type-
    * filtered event stream (filters push to the scan), each joined on
    * the user key — steps are few and user-keyed joins co-partition, so
    * the chain is |steps| small shuffles, never a window over the full
    * stream.
    */
  def funnel(
      df: DataFrame, userCol: String, tsCol: String, typeCol: String,
      steps: Seq[String],
  ): DataFrame = {
    require(steps.nonEmpty, "funnel: need at least one step")
    val ev = df.select(col(userCol).as("user"), col(tsCol).as("ts"),
      col(typeCol).as("et"))
    var cur = ev.where(col("et") === steps.head)
      .groupBy("user").agg(min(col("ts")).as("t0"))
    steps.zipWithIndex.drop(1).foreach { case (st, i) =>
      val next = ev.where(col("et") === st)
        .join(cur.select(col("user"), col(s"t${i - 1}")), Seq("user"))
        .where(col("ts") >= col(s"t${i - 1}"))
        .groupBy("user").agg(min(col("ts")).as(s"t$i"))
      cur = cur.join(next, Seq("user"), "left")
    }
    val aggs: Seq[Column] = steps.indices.map(i =>
      coalesce(sum(col(s"t$i").isNotNull.cast("long")), lit(0L)).as(s"n$i"))
    val one = cur.agg(aggs.head, aggs.tail: _*)
    val rows = steps.zipWithIndex.map { case (st, i) =>
      struct(lit(i).as("step_idx"), lit(st).as("step"), col(s"n$i").as("n_users"),
        (if (i == 0) lit(null).cast("double")
         else round(col(s"n$i").cast("double") /
           when(col(s"n${i - 1}") === 0, lit(null)).otherwise(col(s"n${i - 1}"))
             .cast("double"), 6)).as("conv_frac"))
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.step_idx").as("step_idx"), col("r.step").as("step"),
        col("r.n_users").as("n_users"), col("r.conv_frac").as("conv_frac"))
  }

  /** Per-user event-type transition matrix (the Markov view of user
    * journeys): for each ordered (from, to) pair of consecutive events
    * within a user's stream, the transition count and the row-
    * normalized probability P(to | from). One user-key shuffle, one lag
    * window (total order (ts, tie) so equal timestamps are
    * deterministic), one pair-keyed map-side-combined count; the row
    * normalization joins the from-grained totals — a dimension-sized
    * frame at any scale.
    *
    * @return (from_type, to_type, n_transitions, prob) — prob rounded
    *         to 6
    */
  def eventTransitions(
      df: DataFrame, userCol: String, tsCol: String, typeCol: String,
      tieCol: String,
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    val pairs = df
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .where(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val totals = pairs.groupBy("from_type")
      .agg(sum(col("n_transitions")).as("__tot"))
    pairs.join(totals, "from_type")
      .select(col("from_type"), col("to_type"), col("n_transitions"),
        round(col("n_transitions").cast("double") / col("__tot").cast("double"), 6)
          .as("prob"))
  }

  /** First-seen retention cohorts: users grouped by the ISO week of
    * their first event, each cohort's share still active k weeks later.
    * One distinct (user, week) aggregate, one user-keyed first-seen
    * min, one cohort-grained finish.
    *
    * @return (cohort, offset, n_active, cohort_size, retention) for
    *         offsets 0 until `periods`
    */
  def retentionCohorts(
      df: DataFrame, userCol: String, tsCol: String, periods: Int = 8,
  ): DataFrame = {
    val activity = df.select(col(userCol).as("user"),
      date_trunc("week", col(tsCol)).as("week")).distinct()
    val first = activity.groupBy("user").agg(min(col("week")).as("cohort"))
    val joined = activity.join(first, Seq("user"))
      .withColumn("offset",
        (datediff(col("week").cast("date"), col("cohort").cast("date")) / 7)
          .cast("int"))
      .where(col("offset") < periods)
      // (user, week) is distinct, so rows per (cohort, offset) ARE users
      .groupBy("cohort", "offset").agg(count(lit(1)).as("n_active"))
    val sizes = first.groupBy("cohort").agg(count(lit(1)).as("cohort_size"))
    joined.join(sizes, Seq("cohort"))
      .select(col("cohort"), col("offset"), col("n_active"), col("cohort_size"),
        round(col("n_active").cast("double") / col("cohort_size").cast("double"), 6)
          .as("retention"))
  }
}
