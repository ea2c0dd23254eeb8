package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.pipeline.Curation

/** Scale record for [[Curation.capPerStratum]] in the regime it targets:
  * UNBOUNDED strata counts — one 90%-mass mega-host plus a million
  * distinct tail hosts, the shape of a real crawl.
  *
  * The shipped operator is the PLAIN constant-cap rank window: Spark
  * rewrites `row_number() <= cap` to WindowGroupLimit, which keeps
  * ≤ cap rows per stratum map-side before the exchange — the mega-host
  * never becomes one sort task. This bench keeps the ALTERNATIVE the
  * operator rejected (clampBucket offsets joined by (stratum, bucket),
  * the selectTopPerDomain machinery adapted to a constant cap) as a
  * measured negative result: at 50M rows it ran 6.3–7.4s vs 4.7–5.1s
  * for the shipped window — the bucket exchanges only pay off when the
  * per-stratum limit is a variable column no group-limit rewrite can
  * absorb. Asserts result equality between the two on every run, and
  * that the shipped plan actually contains WindowGroupLimit.
  *
  * Usage: tools/run.sh graft.CapScaleBench [smallN] [bigN]
  *   (defaults 5e6 / 5e7)
  */
object CapScaleBench {
  def main(args: Array[String]): Unit = {
    val smallN = args.headOption.map(_.toLong).getOrElse(5000000L)
    val bigN = args.drop(1).headOption.map(_.toLong).getOrElse(50000000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("graft-cap-scale")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 90% of rows on one mega-host; the rest over 1M distinct tails
    def corpus(n: Long): DataFrame =
      spark.range(n).select(col("id").as("doc_id"))
        .withColumn("host",
          when(pmod(col("doc_id"), lit(10)) < 9, lit("mega.example.org"))
            .otherwise(concat(lit("h"), pmod(col("doc_id"), lit(1000000L)))))

    val cap = 100L
    // the rejected bucket-offset variant, kept for the A/B record
    def bucketed(df: DataFrame): DataFrame = {
      val gate = Curation.idGate(col("doc_id"))
      val keyed = df.withColumn("__gate", gate)
        .withColumn("__b",
          greatest(least(floor(col("__gate").cast("double") / 977), lit(1023)),
            lit(0)).cast("long"))
      val offs = keyed.groupBy(col("host"), col("__b")).agg(count(lit(1)).as("__n"))
        .withColumn("__off",
          sum("__n").over(Window.partitionBy("host").orderBy("__b")) - col("__n"))
        .select(col("host"), col("__b"), col("__off"))
      val sel = Window.partitionBy(col("host"), col("__b"))
        .orderBy(col("__gate"), col("doc_id"))
      keyed.join(offs, Seq("host", "__b"))
        .where(col("__off") < cap)
        .withColumn("__rk", row_number().over(sel) + col("__off"))
        .where(col("__rk") <= cap)
        .select(col("doc_id"), col("host"))
    }

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }

    // plan pin: the shipped shape must carry the group-limit rewrite
    val probe = Curation.capPerStratum(corpus(1000L), "doc_id", "host", cap)
    require(probe.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      "capPerStratum lost its WindowGroupLimit rewrite")

    // equality: the two shapes are the same operator
    val small = corpus(smallN).cache()
    small.count()
    val a = Curation.capPerStratum(small, "doc_id", "host", cap)
    val b = bucketed(small)
    require(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "capPerStratum diverged from the bucketed variant")
    println(s"equality OK at $smallN rows (${a.count()} kept)")
    small.unpersist()

    val big = corpus(bigN)
    Seq(1, 2).foreach { round =>
      time(s"capPerStratum (window) n=$bigN round $round") {
        Curation.capPerStratum(big, "doc_id", "host", cap)
          .write.format("noop").mode("overwrite").save()
      }
      time(s"bucketed alternative   n=$bigN round $round") {
        bucketed(big).write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
