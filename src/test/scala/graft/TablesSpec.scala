package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Tables.load's adaptive events read: the driver has regenerated
  * events.parquet with different physical types for `ts` across rounds
  * (TIMESTAMP(NANOS)-annotated INT64, then timestamp[us]), so the loader
  * probes the footer instead of assuming. One branch per representation:
  * a timestamp footer is served directly (NTZ cast to the session-zoned
  * type), and a raw-INT64 footer gets the nanos→micros conversion.
  */
class TablesSpec extends SparkSpec {

  private def writeEvents(df: org.apache.spark.sql.DataFrame): String = {
    val dir = Files.createTempDirectory("graft-tables-spec").toFile.getPath
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private val wantUtc = java.sql.Timestamp.valueOf("2024-03-01 12:30:45.123456")

  test("timestamp[us] footer (current testdata) is served directly as session-zoned") {
    import spark.implicits._
    val dir = writeEvents(
      Seq((1L, "2024-03-01 12:30:45.123456"))
        .toDF("event_id", "s")
        .select(col("event_id"),
          col("s").cast(TimestampNTZType).as("ts")))
    val got = Tables.load(spark, dir, "events")
    assert(got.schema("ts").dataType === TimestampType)
    assert(got.select("ts").head().getTimestamp(0) === wantUtc)
  }

  test("already session-zoned timestamp footer is served unchanged") {
    import spark.implicits._
    val dir = writeEvents(
      Seq((1L, "2024-03-01 12:30:45.123456"))
        .toDF("event_id", "s")
        .select(col("event_id"), col("s").cast(TimestampType).as("ts")))
    val got = Tables.load(spark, dir, "events")
    assert(got.schema("ts").dataType === TimestampType)
    assert(got.select("ts").head().getTimestamp(0) === wantUtc)
  }

  test("raw INT64 footer is treated as epoch nanos (the NANOS-era workaround)") {
    import spark.implicits._
    val micros = wantUtc.getTime * 1000L + 456L // ms→µs plus sub-ms digits
    val dir = writeEvents(
      Seq((1L, micros * 1000L)).toDF("event_id", "ts"))
    val got = Tables.load(spark, dir, "events")
    assert(got.schema("ts").dataType === TimestampType)
    assert(got.select("ts").head().getTimestamp(0) === wantUtc)
  }

  test("probe is memoized per path, not per table name") {
    import spark.implicits._
    // same name ("events"), two dirs with DIFFERENT physical types —
    // both must resolve correctly in one JVM
    val tsDir = writeEvents(
      Seq((1L, "2024-03-01 00:00:00")).toDF("event_id", "s")
        .select(col("event_id"), col("s").cast(TimestampNTZType).as("ts")))
    val longDir = writeEvents(
      Seq((1L, 1709251200L * 1000000000L)).toDF("event_id", "ts"))
    val a = Tables.load(spark, tsDir, "events").select("ts").head().getTimestamp(0)
    val b = Tables.load(spark, longDir, "events").select("ts").head().getTimestamp(0)
    assert(a === b)
  }
}
