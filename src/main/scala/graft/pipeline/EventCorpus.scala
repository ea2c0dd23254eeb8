package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType, StructField, StructType}

import graft.operators.Sessionize

/** Behavioral-log → analytics/corpus operators: schema-on-read JSON
  * property extraction and sessionized dialogue-corpus construction —
  * the steps that turn an event stream into per-type telemetry cards
  * and per-session training documents.
  */
object EventCorpus {

  /** Extract a BIGINT field from a JSON string column, schema-on-read:
    * `from_json` with an explicit one-field schema (Jackson-backed,
    * null on malformed/missing — no exceptions in the scan), then the
    * field projected out. A map-only expression: the extraction runs
    * inside the scan's codegen stage and any downstream filter on the
    * field is applied before a single byte shuffles.
    */
  def jsonLongField(jsonCol: Column, field: String): Column =
    from_json(jsonCol, StructType(Seq(StructField(field, LongType))))
      .getField(field)

  /** Per-type telemetry card over a JSON props column: event counts,
    * extraction coverage (how many rows parsed), exact sum / min / max
    * of the extracted field, and the fraction at-or-above `hiThreshold`
    * — ONE map-side-combined aggregate over the scan, extraction
    * inlined (no separate parse pass, no UDF).
    */
  def propsStats(
      df: DataFrame, typeCol: String, jsonCol: String, field: String,
      hiThreshold: Long,
  ): DataFrame = {
    val k = jsonLongField(col(jsonCol), field)
    df.select(col(typeCol).as("event_type"), k.as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        count(col("k")).as("n_parsed"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        round(sum(when(col("k") >= hiThreshold, 1L).otherwise(0L))
          .cast("double") / when(count(col("k")) === 0, lit(null))
          .otherwise(count(col("k"))).cast("double"), 6).as("hi_frac"))
  }

  /** Sessionized dialogue documents: each (user, session) becomes one
    * training document — the ordered event-type turn sequence as text,
    * with turn count and exact value total. This is the log-to-corpus
    * construction step behavioral training data goes through.
    *
    * Shape: [[Sessionize.labeled]]'s single key shuffle + two codegen
    * windows, then ONE session-keyed aggregate. The turn text is
    * array_sort(collect_list(struct(ts, tieCol, type))) joined map-side
    * in the finish — per-session lists are gap-bounded (a session only
    * grows while events keep arriving within `gap`), so the lambda
    * transform runs on session-sized arrays, never corpus-sized ones.
    *
    * @param tieCol unique per-event column breaking equal-timestamp
    *               ties, so the turn order is total and replayable
    * @return (user, session_start, n_turns, turns, total_value)
    */
  def dialogueCorpus(
      df: DataFrame, keyCol: String, tsCol: String, typeCol: String,
      valueCol: String, tieCol: String, gap: String,
  ): DataFrame =
    Sessionize.labeled(df, keyCol, tsCol, gap)
      .groupBy(col(keyCol).as("user"), col("__session"))
      .agg(
        min(col(tsCol)).as("session_start"),
        count(lit(1)).as("n_turns"),
        array_join(
          transform(
            array_sort(collect_list(struct(col(tsCol), col(tieCol), col(typeCol)))),
            s => s.getField(typeCol)),
          " -> ").as("turns"),
        // exact decimal accumulate → double: associative, so the sum is
        // identical under any partitioning (and in an external replay)
        sum(col(valueCol).cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .drop("__session")
}
