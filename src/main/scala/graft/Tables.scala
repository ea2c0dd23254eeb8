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
  // Fallback read schema for events when the footer carries a TIMESTAMP
  // annotation Spark's inference rejects (e.g. NANOS): declare ts as
  // LongType so the scan serves the raw INT64, then convert explicitly.
  private val eventsSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
  }

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables small enough to broadcast at ANY scale factor:
    * region (5 rows) and nation (25 rows) are fixed-size in TPC-H.
    */
  val broadcastable: Set[String] = Set("region", "nation")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, s"$dir/$name.parquet")
    else spark.read.parquet(s"$dir/$name.parquet")

  // events.ts has shipped with different physical types across testdata
  // generations (TIMESTAMP(NANOS) annotated INT64, then timestamp[us]),
  // so the read probes the footer instead of assuming. Memoized per path
  // — one footer read per table per JVM, not per query.
  private val eventsTsKind =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def loadEvents(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val kind = eventsTsKind.computeIfAbsent(path, { p =>
      scala.util.Try(spark.read.parquet(p).schema("ts").dataType) match {
        case scala.util.Success(TimestampType)    => "ts"
        case scala.util.Success(TimestampNTZType) => "ntz"
        // LongType (unannotated INT64) or inference failure (NANOS
        // annotation is rejected by the vectorized reader): raw nanos.
        case _                                    => "nanos"
      }
    })
    kind match {
      case "ts" => spark.read.parquet(path)
      case "ntz" =>
        // Downstream operators (and the r10-green oracle compares) were
        // written against session-zoned TimestampType; under the UTC
        // session this cast is value-identity on the naive micros.
        spark.read.parquet(path).withColumn("ts", col("ts").cast(TimestampType))
      case _ =>
        // Ask for ts AS LongType via an explicit read schema — the
        // reader serves the raw INT64 nanos — then convert with integer
        // division (a double division would lose precision at the
        // 1e18-ns scale). Per-read and side-effect-free, unlike the
        // session-global spark.sql.legacy.parquet.nanosAsLong conf.
        spark.read.schema(eventsSchema).parquet(path)
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    }
  }

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
