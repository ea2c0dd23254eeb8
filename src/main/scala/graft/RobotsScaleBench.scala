package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Urls

/** Scale record for the robots.txt screen (PLANS.md): parse 1M hosts'
  * robots bodies into agent-`*` rules, then screen N synthetic URLs.
  *
  * The shape under test is the one the operator claims at 100 TB: the
  * parse is host-partitioned over KB-bounded bodies (cost ∝ hosts,
  * independent of corpus size), and the screen is an anti-join whose
  * rule side is hosts-sized — broadcastable — so the URL side stays
  * map-side and the screen should scale ~linearly in URLs with the
  * parse a fixed prologue.
  *
  * Usage: tools/run.sh graft.RobotsScaleBench [smallN] [bigN] [hosts]
  *   (defaults 5e6 / 5e7 URLs over 1e6 hosts)
  */
object RobotsScaleBench {
  def main(args: Array[String]): Unit = {
    val smallN = args.headOption.map(_.toLong).getOrElse(5000000L)
    val bigN = args.drop(1).headOption.map(_.toLong).getOrElse(50000000L)
    val hosts = args.drop(2).headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("graft-robots-scale")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // every host disallows /private; every other host also /p/1; one
    // ignored badbot group exercises the group logic at full width
    val robots = spark.range(hosts)
      .select(concat(lit("h"), col("id"), lit(".example.org")).as("host"),
        concat(
          lit("User-agent: badbot\nDisallow: /\n\nUser-agent: *\n" +
            "Disallow: /private\n"),
          when(pmod(col("id"), lit(2)) === 0, lit("Disallow: /p/1\n"))
            .otherwise(lit(""))).as("body"))

    def urls(n: Long): DataFrame =
      spark.range(n).select(col("id").as("doc_id"),
        concat(lit("http://h"), pmod(col("id"), lit(hosts)),
          lit(".example.org/p/"), col("id")).as("url"))

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val rules = time(s"parse ($hosts hosts)") {
      val r = Urls.robotsDisallows(robots, "host", "body").persist()
      println(s"  rules: ${r.count()}")
      r
    }
    for (n <- Seq(smallN, bigN)) {
      val kept = time(s"screen ($n urls)") {
        Urls.robotsScreen(urls(n), "url", rules).count()
      }
      println(s"  kept $kept of $n (blocked ${n - kept})")
    }
    spark.stop()
  }
}
