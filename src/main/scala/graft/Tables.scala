package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table access for the driver-generated TPC-H-ish star schema
  * (see /root/repo/TESTDATA.md). One parquet file per table.
  *
  * `documents` and `embeddings` exist on disk at every scale factor but
  * are undocumented in TESTDATA.md (which is read-only) — this list is
  * the source of truth for what the driver actually generated.
  *
  * At 100 TB these would be partitioned/bucketed datasets; the reader
  * path is identical (`spark.read.parquet(dir)`), so nothing here
  * assumes single-file inputs.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables small enough to broadcast at ANY scale factor:
    * region (5 rows) and nation (25 rows) are fixed-size in TPC-H.
    */
  val broadcastable: Set[String] = Set("region", "nation")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects; read nanos as long and convert (integer division
      // — a double division would lose precision at the 1e18-ns scale).
      // KNOWN TRADEOFF: the conf is session-global and stays set — it is
      // consulted at SCAN time, so restoring it here would break the
      // lazy plan this function returns. Later reads of other
      // nanos-timestamp parquet in the same session will see LongType.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Load with a broadcast hint applied when the table is a fixed-size
    * dimension — join sides built from this never shuffle. */
  def loadForJoin(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = load(spark, dir, name)
    if (broadcastable(name)) org.apache.spark.sql.functions.broadcast(df) else df
  }

  /** Register every table as a temp view named after the table, so
    * spark.sql(...) queries mirror the DuckDB oracle's table refs.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n => load(spark, dir, n).createOrReplaceTempView(n) }
}
