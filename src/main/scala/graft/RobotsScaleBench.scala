package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Urls

/** Scale record for the robots.txt screen (PLANS.md): parse 10M hosts'
  * robots bodies into agent-`*` Allow/Disallow rules, then screen N
  * synthetic URLs under RFC 9309 longest-match precedence.
  *
  * The shape under test is the one the operator claims at 100 TB, in
  * BOTH regimes (r17 VERDICT — the old bench only measured a mandatory
  * broadcast, 10–100× short of the regime that matters):
  *
  *  - parse: (host, body)-partitioned over KB-bounded bodies — cost ∝
  *    hosts, independent of corpus size;
  *  - broadcast regime: right when the rule side is small (a per-batch
  *    archive screen) — measured at ≤1M hosts, because a multi-GB
  *    agent-`*` rule set over 10⁷–10⁸ hosts is exactly the
  *    driver/executor memory cliff the scale regime exists to avoid
  *    (forcing it here would bench a failure mode, not a plan);
  *  - scale regime (`broadcastRules = false`): a narrow (id, host,
  *    path) projection joins the rules shuffled on host, blocked ids
  *    anti-join back to the payload rows — measured at the full host
  *    count, where per-URL cost should stay ~flat as hosts grow 10×.
  *
  * Usage: tools/run.sh graft.RobotsScaleBench [smallN] [bigN] [hosts]
  *   (defaults 5e6 / 5e7 URLs over 1e7 hosts)
  */
object RobotsScaleBench {
  def main(args: Array[String]): Unit = {
    val smallN = args.headOption.map(_.toLong).getOrElse(5000000L)
    val bigN = args.drop(1).headOption.map(_.toLong).getOrElse(50000000L)
    val hosts = args.drop(2).headOption.map(_.toLong).getOrElse(10000000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("graft-robots-scale")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // every host disallows /private; even hosts also /p/1 with an
    // Allow carve-out (exercising the precedence aggregate); every
    // fifth host a wildcard rule (exercising the regex residual); one
    // ignored badbot group exercises the group logic at full width
    def robots(nHosts: Long) = spark.range(nHosts)
      .select(concat(lit("h"), col("id"), lit(".example.org")).as("host"),
        concat(
          lit("User-agent: badbot\nDisallow: /\n\nUser-agent: *\n" +
            "Disallow: /private\n"),
          when(pmod(col("id"), lit(2)) === 0,
            lit("Disallow: /p/1\nAllow: /p/12\n")).otherwise(lit("")),
          when(pmod(col("id"), lit(5)) === 0, lit("Disallow: /p/2*3\n"))
            .otherwise(lit(""))).as("body"))

    def urls(n: Long, nHosts: Long): DataFrame =
      spark.range(n).select(col("id").as("doc_id"),
        concat(lit("http://h"), pmod(col("id"), lit(nHosts)),
          lit(".example.org/p/"), col("id")).as("url"))

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // ---- broadcast regime at the host count where a broadcast is the
    // RIGHT plan (capped: beyond ~1M hosts the rule table is the
    // memory cliff the scale regime avoids)
    val bcHosts = math.min(hosts, 1000000L)
    val bcRules = time(s"parse ($bcHosts hosts, broadcast regime)") {
      val r = Urls.robotsDisallows(robots(bcHosts), "host", "body").persist()
      println(s"  rules: ${r.count()}")
      r
    }
    for (n <- Seq(smallN, bigN)) {
      val kept = time(s"broadcast screen ($n urls, $bcHosts hosts)") {
        Urls.robotsScreen(urls(n, bcHosts), "url", bcRules,
          idCol = Some("doc_id")).count()
      }
      println(s"  kept $kept of $n (blocked ${n - kept})")
    }
    bcRules.unpersist()

    // ---- scale regime at the FULL host count: no broadcast anywhere
    // on the rule side, payload never shuffles on the skew-prone host
    val rules = time(s"parse ($hosts hosts, scale regime)") {
      val r = Urls.robotsDisallows(robots(hosts), "host", "body").persist()
      println(s"  rules: ${r.count()}")
      r
    }
    for (n <- Seq(smallN, bigN)) {
      val kept = time(s"scale screen ($n urls, $hosts hosts)") {
        Urls.robotsScreen(urls(n, hosts), "url", rules,
          broadcastRules = false, idCol = Some("doc_id")).count()
      }
      println(s"  kept $kept of $n (blocked ${n - kept})")
    }
    spark.stop()
  }
}
