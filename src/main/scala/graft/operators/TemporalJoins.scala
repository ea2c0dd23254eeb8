package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal/range join operators Spark lacks as built-ins, implemented in
  * the shapes that survive 100 TB — never a broadcast-nested-loop or
  * range explosion:
  *
  *  - [[AsofJoin.backward]]: union both sides, one shuffle on the key,
  *    carry the latest right payload forward with a running
  *    `last(ignoreNulls)` window. Cost: one shuffle + one linear pass per
  *    key partition. (A naive `l.ts >= r.ts` non-equi join plans as
  *    BroadcastNestedLoopJoin and dies at scale.)
  *  - [[RangeJoin.pointInRange]]: each range row explodes to the integer
  *    buckets it covers; each point keys to its one bucket; the join is an
  *    equi-join on the bucket plus a residual predicate. Shuffle keys are
  *    buckets, so co-location is by value locality; each (range, point)
  *    pair meets in exactly one bucket (the point's), so no dedup pass is
  *    needed.
  */
object AsofJoin {

  /** Backward (most common) as-of: for every left row, the single right
    * row with the greatest `rightTs <= leftTs` in the same key group —
    * inclusive on ties, left-outer (unmatched left rows keep nulls).
    *
    * The right side should be unique per (key, ts); pre-aggregate it if
    * not (an as-of against duplicate timestamps is ill-defined in any
    * engine).
    *
    * @param rightCols right columns to attach, renamed via the map
    *                  (rightName -> outputName)
    */
  def backward(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      rightCols: Map[String, String],
  ): DataFrame = {
    val leftOut = left.columns.toSeq
    val payload = struct(rightCols.keys.toSeq.map(col): _*)
    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__ts", col(leftTs))
      .withColumn("__tag", lit(1))
      .withColumn("__r", lit(null).cast(
        right.select(payload).schema.head.dataType))
    val r = right.select(
      col(rightKey).as("__k"), col(rightTs).as("__ts"),
      lit(0).as("__tag"), payload.as("__r"))
    // right rows (tag 0) sort before left rows (tag 1) at equal ts, so a
    // right row at exactly leftTs is visible — inclusive as-of.
    val w = Window.partitionBy("__k").orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = l.select(col("__k"), col("__ts"), col("__tag"),
        col("__r"), struct(leftOut.map(col): _*).as("__l"))
      .unionByName(r.withColumn("__l", lit(null).cast(
        left.select(struct(leftOut.map(col): _*)).schema.head.dataType)))
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__tag") === 1)
    val outCols = leftOut.map(c => col(s"__l.$c").as(c)) ++
      rightCols.map { case (from, to) => col(s"__match.$from").as(to) }
    attached.select(outCols: _*)
  }
}

object RangeJoin {

  /** Inner join `points` to every `ranges` row whose [lo, hi] interval
    * (inclusive) contains the point. Ranges explode to the buckets they
    * cover (`ceil((hi-lo)/width)+1` rows each — size `width` to the
    * typical range span); points hash to their single bucket, so the
    * shuffle is an equi-join on bucket ids and each qualifying pair
    * meets exactly once.
    */
  def pointInRange(
      points: DataFrame, pointCol: String,
      ranges: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Double,
  ): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pBucket = floor(col(pointCol) / bucketWidth).cast("long")
    val rBuckets = sequence(
      floor(col(loCol) / bucketWidth).cast("long"),
      floor(col(hiCol) / bucketWidth).cast("long"))
    val r = ranges.withColumn("__bucket", explode(rBuckets))
    val p = points.withColumn("__bucket", pBucket)
    // side-qualified references: a shared column name between points and
    // ranges must not make the residual predicate ambiguous
    p.join(r, p("__bucket") === r("__bucket") &&
        p(pointCol) >= r(loCol) && p(pointCol) <= r(hiCol))
      .drop("__bucket")
  }
}

object Sessionize {

  /** Gaps-and-islands sessionization: events within `gap` of the previous
    * event (strictly less than `gap` apart) share a session. One shuffle
    * on the key; two window passes (lag + running sum), both codegen'd.
    *
    * Output: key, session_start = min ts, session_end = max ts + gap
    * (the streaming session_window convention), n_events, plus any
    * aggregates appended by the caller via the returned grouping.
    */
  def sessions(
      df: DataFrame, keyCol: String, tsCol: String, gap: String,
      aggs: Seq[Column] = Seq.empty,
  ): DataFrame = {
    val gapExpr = expr(s"INTERVAL $gap")
    val aggCols = Seq(
      min(col(tsCol)).as("session_start"),
      (max(col(tsCol)) + gapExpr).as("session_end"),
      count(lit(1)).as("n_events")) ++ aggs
    labeled(df, keyCol, tsCol, gap)
      .groupBy(col(keyCol), col("__session"))
      .agg(aggCols.head, aggCols.tail: _*)
      .drop("__session")
  }

  /** The per-event half of [[sessions]]: the input frame plus a
    * `__session` running-count label (1-based per key, ordered by ts) —
    * for callers that need the detail rows grouped by session (e.g.
    * dialogue-corpus construction) rather than the aggregate card.
    * Same single key-shuffle + two codegen window passes. */
  def labeled(
      df: DataFrame, keyCol: String, tsCol: String, gap: String,
  ): DataFrame = {
    val gapExpr = expr(s"INTERVAL $gap")
    val w = Window.partitionBy(keyCol).orderBy(tsCol)
    df
      .withColumn("__prev", lag(col(tsCol), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull ||
          col(tsCol) >= col("__prev") + gapExpr, 1).otherwise(0))
      .withColumn("__session", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev", "__new")
  }
}
