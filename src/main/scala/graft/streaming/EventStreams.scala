package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Structured Streaming extension over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference has NO streaming of any kind (SURVEY.md §1.1) — this is
  * the beyond-reference scale path: the same aggregations the batch
  * engine runs, expressed incrementally with watermarks so state stays
  * bounded on an unbounded source.
  */
object EventStreams {

  /** Tumbling-window counts+sums per event type. Works identically on a
    * batch frame or a readStream frame (Structured Streaming's unified
    * Dataset API); with a stream input, the 10-minute watermark bounds
    * state eviction.
    */
  def windowedStats(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame = {
    val isStreaming = events.isStreaming
    val src = if (isStreaming) events.withWatermark("ts", watermark) else events
    src
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum("value").as("sum_value"),
        approx_count_distinct("user_id").as("approx_users"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"), col("approx_users"))
  }

  final case class SessionState(count: Long, sumValue: Double, lastTs: Long)
  final case class SessionOut(user_id: Long, n_events: Long, sum_value: Double)

  /** Custom per-user session state via mapGroupsWithState: emits a running
    * per-user aggregate, timing out sessions after `timeoutMs` of
    * inactivity. Demonstrates the KeyValueGroupedDataset state path the
    * prompt calls for; state is per-key and watermark-bounded.
    */
  def sessionize(spark: SparkSession, events: DataFrame, timeoutMs: Long = 30 * 60 * 1000L): DataFrame = {
    import spark.implicits._
    val typed = events.selectExpr(
      "user_id", "cast(ts as long) * 1000 as ts_ms", "value")
      .as[(Long, Long, Double)]
    typed.groupByKey(_._1)
      .mapGroupsWithState[SessionState, SessionOut](GroupStateTimeout.ProcessingTimeTimeout) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // session expired: emit the final aggregate and EVICT the
            // state — without remove() every user key lives forever
            val fin = state.getOption.getOrElse(SessionState(0L, 0.0, 0L))
            state.remove()
            SessionOut(userId, fin.count, fin.sumValue)
          } else {
            val prev = state.getOption.getOrElse(SessionState(0L, 0.0, 0L))
            var count = prev.count
            var sumV = prev.sumValue
            var lastTs = prev.lastTs
            rows.foreach { case (_, ts, v) =>
              count += 1; sumV += v; lastTs = math.max(lastTs, ts)
            }
            state.update(SessionState(count, sumV, lastTs))
            state.setTimeoutDuration(timeoutMs)
            SessionOut(userId, count, sumV)
          }
      }.toDF()
  }

  final case class FunnelState(times: Array[Long])
  final case class FunnelOut(user_id: Long, steps_completed: Int)

  /** Incremental ordered-step funnel via flatMapGroupsWithState: per
    * user, the state is one epoch-ms first-completion time per step
    * (−1 until reached), so a step begun in one micro-batch can be
    * completed in a later one — the cross-batch version of
    * [[graft.operators.EventAnalytics.funnel]]'s at-or-after rule.
    * Each batch's rows are sorted by (event time, `tieCol`) before
    * folding (a micro-batch iterator has no order guarantee, and a
    * ts-only sort would fold equal-timestamp events in nondeterministic
    * iterator order — `tieCol` pins the repo's total-order convention,
    * same as the batch [[graft.operators.EventAnalytics.eventTransitions]]).
    * The tie key keeps its NATIVE ordering: numeric tie columns compare
    * as numbers (via an exact decimal cast, so long ids never fold
    * "10" before "9" the way a string cast would), everything else as
    * its string form — matching the batch window's `orderBy(ts, tie)`.
    * Input contract: (user_id, ts, event_type) plus `tieCol`; a frame
    * WITHOUT the tie column falls back to a constant tie key (ts-only
    * order — deterministic state, but equal-ts claim order is then the
    * fold's own), preserving the pre-tieCol API.
    * Late data arriving after a later step already completed cannot
    * retroactively insert itself — the documented best-effort semantics
    * of watermark-free funnel state. Emits the user's current
    * completed-step count whenever it ADVANCES (update-mode friendly:
    * no output for no-progress batches). State is |steps| longs per
    * active user.
    */
  def funnelStream(spark: SparkSession, events: DataFrame,
      steps: Seq[String], tieCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    // native-order tie key, split by type: numeric columns ride the
    // decimal field (exact for 64-bit ids, unlike a double), all other
    // types the string field; the unused field is constant so the
    // (ts, tieNum, tieStr) sort reduces to the column's own ordering
    val (tieNumExpr, tieStrExpr) =
      if (!events.columns.contains(tieCol)) ("cast(0 as decimal(38,6))", "''")
      else events.schema(tieCol).dataType match {
        case _: org.apache.spark.sql.types.NumericType =>
          (s"cast(coalesce($tieCol, 0) as decimal(38,6))", "''")
        case _ =>
          ("cast(0 as decimal(38,6))", s"coalesce(cast($tieCol as string), '')")
      }
    val typed = events.selectExpr(
      "user_id", "cast(ts as long) * 1000 as ts_ms", "event_type",
      s"$tieNumExpr as tie_num", s"$tieStrExpr as tie_str")
      .as[(Long, Long, String, BigDecimal, String)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (userId, rows, state: GroupState[FunnelState]) =>
          val times = state.getOption.map(_.times)
            .getOrElse(Array.fill(steps.size)(-1L))
          val before = times.lastIndexWhere(_ >= 0) + 1
          rows.toSeq.sortBy(r => (r._2, r._4, r._5)).foreach { case (_, ts, et, _, _) =>
            stepIdx.get(et).foreach { i =>
              if (times(i) < 0 &&
                (i == 0 || (times(i - 1) >= 0 && ts >= times(i - 1))))
                times(i) = ts
            }
          }
          state.update(FunnelState(times))
          val after = times.lastIndexWhere(_ >= 0) + 1
          if (after > before) Iterator(FunnelOut(userId, after)) else Iterator.empty
      }.toDF()
  }

  /** File-source stream over a directory of parquet event files →
    * windowed stats. The readStream→transform→writeStream shape.
    */
  def streamFromDirectory(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    windowedStats(stream)
  }

  /** Exactly-once-per-id dedup on an at-least-once source: state holds
    * each seen id only until the watermark passes its event time, so
    * state stays bounded (a bare dropDuplicates on a stream grows state
    * forever). Batch frames take the plain exact path.
    */
  def dedupStream(events: DataFrame, idCol: String = "event_id",
      watermark: String = "10 minutes"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(idCol)
    else events.dropDuplicates(idCol)

  /** Native session windows (the streaming twin of
    * graft.operators.Sessionize.sessions — identical strict-gap merge
    * semantics, cross-checked in EventStreamsSpec): per-user sessions
    * whose state merges incrementally under a watermark.
    */
  def sessionWindowStats(events: DataFrame, gap: String = "12 hours",
      watermark: String = "10 minutes"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_value"))
  }

  /** Stream-stream interval join: each error event joined to the same
    * user's click events from the preceding `boundSeconds`. Both sides
    * carry watermarks so the join state (buffered rows awaiting matches)
    * is evicted once the bound + watermark passes — the required shape
    * for an unbounded×unbounded join.
    */
  def errorClickJoin(events: DataFrame, boundSeconds: Long = 3600,
      watermark: String = "10 minutes"): DataFrame = {
    val wm = (df: DataFrame) =>
      if (df.isStreaming) df.withWatermark("ts", watermark) else df
    val errors = wm(events.where(col("event_type") === "error"))
      .select(col("event_id").as("error_id"), col("user_id"), col("ts").as("error_ts"))
    val clicks = wm(events.where(col("event_type") === "click"))
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
    errors.join(clicks,
      col("user_id") === col("click_user") &&
        col("click_ts") <= col("error_ts") &&
        col("click_ts") >= col("error_ts") - expr(s"INTERVAL $boundSeconds SECONDS"))
      .drop("click_user")
  }

  /** Idempotent micro-batch sink: every batch lands in its own
    * `batch_id=N` partition directory with overwrite semantics, so a
    * replayed batch (restart, retry) rewrites the same files instead of
    * duplicating rows — the standard foreachBatch exactly-once recipe
    * when the target is a plain parquet directory.
    */
  def idempotentParquetSink(df: DataFrame, path: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        writeBatch(batch.toDF(), path, batchId)
      }
      .start()

  /** The per-batch write the sink performs — overwrite of the batch's own
    * partition directory, so replaying a batch id (restart/retry)
    * rewrites rather than duplicates. Exposed for direct testing.
    */
  def writeBatch(batch: DataFrame, path: String, batchId: Long): Unit =
    batch.write.mode("overwrite").parquet(s"$path/batch_id=$batchId")
}
