package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support: the co-located-join scale path.
  *
  * At 100 TB the repeated fact-fact joins (lineitem ⋈ orders on orderkey)
  * shuffle both sides on every query. Writing both tables bucketed on the
  * join key with the same bucket count makes the join exchange-free: each
  * task reads matching buckets from both sides — no shuffle, ever.
  * This module is that write path plus a plan check used by tests.
  */
object Bucketing {

  /** Persist a frame as a bucketed (and in-bucket sorted) managed table.
    * Sorting by the key lets the join also skip the local sort of a
    * sort-merge join.
    */
  def writeBucketed(
      df: DataFrame, table: String, bucketCols: Seq[String],
      numBuckets: Int, sortCols: Seq[String] = Seq.empty,
  ): Unit = {
    val sorted = if (sortCols.isEmpty) bucketCols else sortCols
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sorted.head, sorted.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket keys. With matching bucket
    * counts Catalyst plans this without a shuffle on either side.
    */
  def bucketedJoin(
      spark: SparkSession, leftTable: String, rightTable: String,
      joinExpr: org.apache.spark.sql.Column, joinType: String = "inner",
  ): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), joinExpr, joinType)

  /** Count shuffle exchanges in the executed plan (0 for a co-located
    * bucketed join). */
  def shuffleCount(df: DataFrame): Int =
    "ShuffleExchange|Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).length
}
