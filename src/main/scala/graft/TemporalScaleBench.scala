package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{AsofJoin, Sessionize}
import graft.streaming.EventStreams

/** Scale proof for the temporal operators (PLANS.md): replicate the
  * sf0.1 events table ×N with remapped user_ids — key cardinality grows
  * ×N while per-key history stays constant, which is how an event log
  * actually grows (more users, not deeper single-user timelines). Under
  * that scaling each operator's one key-hash shuffle spreads over ×N
  * keys and the per-partition linear passes stay flat, so wall-clock
  * should grow sublinearly in rows on a fixed box until the shuffle
  * write dominates — the shape that scales out on a real cluster, where
  * ×N keys means ×N partitions of unchanged size.
  *
  *  - asof: union + running last(ignoreNulls) window (one shuffle on
  *    user_id, one linear pass — never a non-equi broadcast loop)
  *  - sessionize: lag + running-sum windows (one shuffle, two passes)
  *  - window: hour-bucket groupBy (map-side combine into 24·#types·365
  *    cells, shuffle carries only partials)
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/run.sh \
  *   graft.TemporalScaleBench [replicas] [--asof|--sessionize|--window]
  * (no mode flag = run all three)
  */
object TemporalScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicas = args.filterNot(_.startsWith("--"))
      .headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.memory.offHeap.enabled", "true")
      .config("spark.memory.offHeap.size", "24g")
      .appName("graft-temporal-scale")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val events = Tables.load(spark, sfDir, "events")
    val maxUser = events.agg(max("user_id")).head().getLong(0) + 1L
    val scaled = events
      .withColumn("copy", explode(sequence(lit(0), lit(replicas - 1))))
      .select(col("event_id"),
        (col("user_id") + col("copy") * maxUser).as("user_id"),
        col("ts"), col("event_type"), col("value"))
      .persist()
    val nRows = scaled.count()

    def timed(mode: String)(frame: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      frame.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(s"""{"rows":$nRows,"replicas":$replicas,"mode":"$mode","sec":${f"$sec%.2f"}}""")
    }

    val all = !args.exists(_.startsWith("--"))
    if (all || args.contains("--asof")) timed("asof") {
      val errors = scaled.where(col("event_type") === "error")
        .select("event_id", "user_id", "ts", "value")
      val clicks = scaled.where(col("event_type") === "click")
      AsofJoin.backward(errors, clicks,
        leftKey = "user_id", rightKey = "user_id",
        leftTs = "ts", rightTs = "ts",
        rightCols = Map("event_id" -> "click_id", "value" -> "click_value"))
    }
    if (all || args.contains("--sessionize")) timed("sessionize") {
      Sessionize.sessions(scaled, "user_id", "ts", gap = "12 hours",
        aggs = Seq(sum(col("value")).as("sum_value")))
    }
    if (all || args.contains("--window")) timed("window") {
      EventStreams.windowedStats(scaled, windowLen = "1 hour")
    }
    spark.stop()
  }
}
