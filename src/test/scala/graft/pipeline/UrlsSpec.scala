package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** URL canonicalization + per-stratum cap contracts. */
class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def norm(urls: String*): Seq[String] =
    urls.toDF("u").select(Urls.normalizeUrl(col("u"))).as[String].collect().toSeq

  test("normalizeUrl: case, ports, fragments, tracking params, separators") {
    assert(norm(
      "HTTP://WWW.Example.COM:80/Path/One?utm_source=x&id=5#frag",
      "https://a.b:443/",
      "https://a.b:8443/x",
      "http://user:pw@Host.org/p",
      "http://h.io",
      "http://h.io?utm_campaign=z",
      "http://h.io/p?a=1&&b=2&utm_medium=m",
      "http://h.io/p?utm_a=1&utm_b=2",
      "not a url#frag",
    ) == Seq(
      "http://www.example.com/Path/One?id=5", // scheme+host lowered, :80 + utm + #frag gone, path case kept
      "https://a.b/",                          // :443 stripped
      "https://a.b:8443/x",                    // non-default port kept
      "http://host.org/p",                     // userinfo dropped
      "http://h.io/",                          // empty path → /
      "http://h.io/",                          // query emptied by tracking strip → dropped
      "http://h.io/p?a=1&b=2",                 // && collapsed, trailing tracker stripped
      "http://h.io/p",                         // all-tracker query gone
      "not a url",                             // non-URL: fragment-lookalike only
    ))
  }

  test("hostOf / registrableHost") {
    val row = Seq("HTTPS://User@WWW.News.Example.ORG:8080/a?b#c").toDF("u")
      .select(Urls.hostOf(col("u")), Urls.registrableHost(col("u")))
      .as[(String, String)].head()
    assert(row == ("www.news.example.org", "news.example.org"))
    assert(Seq("garbage").toDF("u").select(Urls.hostOf(col("u")))
      .as[String].head() == "")
  }

  test("capPerStratum: exact cap, deterministic order, partitioning-invariant, skew-heavy stratum") {
    // one mega-stratum (900 rows) + two small ones
    val df = ((1L to 900L).map(i => (i, "mega")) ++
      (1000L to 1003L).map(i => (i, "tiny")) ++
      Seq((2000L, "solo"))).toDF("id", "host")
    val capped = Curation.capPerStratum(df, "id", "host", cap = 10)
    val byHost = capped.groupBy("host").count().as[(String, Long)].collect().toMap
    assert(byHost == Map("mega" -> 10L, "tiny" -> 4L, "solo" -> 1L),
      s"cap must bind only above the cap: $byHost")
    // kept ids are the first 10 in (idGate, id) order — replay directly
    def gateOf(i: Long) = ((i % 100000L) * 2654435761L) % 1000000L
    val expectMega = (1L to 900L).sortBy(i => (gateOf(i), i)).take(10).toSet
    val gotMega = capped.where(col("host") === "mega")
      .select("id").as[Long].collect().toSet
    assert(gotMega == expectMega, "selection must follow the gate order")
    // physical partitioning must not change the selection
    val repart = Curation.capPerStratum(df.repartition(13), "id", "host", cap = 10)
      .select("id").as[Long].collect().toSet
    assert(repart == capped.select("id").as[Long].collect().toSet)
    // schema passes through unchanged
    assert(capped.columns.toSeq == Seq("id", "host"))
    intercept[IllegalArgumentException](
      Curation.capPerStratum(df, "id", "host", cap = 0))
  }

  test("robotsDisallows: groups, stacked agents, comments, empty Disallow") {
    val txt = Seq(
      "# site robots",
      "User-agent: badbot",
      "Disallow: /",
      "",
      "User-agent: goodbot",
      "User-agent: *", // stacked: star shares the group header
      "Disallow: /private  # members only",
      "Disallow: /tmp",
      "Disallow:", // empty = allow-all, no rule
      "",
      "User-agent: extra",
      "Disallow: /never",
    ).mkString("\n")
    val rules = Urls.robotsDisallows(
      Seq(("a.example.org", txt)).toDF("host", "robots"), "host", "robots")
      .as[(String, String)].collect().toSet
    assert(rules == Set(
      ("a.example.org", "/private"),
      ("a.example.org", "/tmp")),
      s"only the *-group's non-empty Disallows apply: $rules")

    // a robots body with no *-group yields no rules at all
    val none = Urls.robotsDisallows(
      Seq(("b.example.org", "User-agent: x\nDisallow: /"))
        .toDF("host", "robots"), "host", "robots").count()
    assert(none == 0)
  }

  test("robotsScreen: exact-host prefix matching drops disallowed URLs only") {
    val rules = Seq(("a.example.org", "/private"), ("a.example.org", "/p/1"))
      .toDF("host", "prefix")
    val urls = Seq(
      (1L, "http://a.example.org/private/x"),   // blocked: prefix
      (2L, "http://a.example.org/p/12"),        // blocked: /p/1 prefix-matches /p/12
      (3L, "http://a.example.org/p/2"),         // kept
      (4L, "http://www.a.example.org/private"), // kept: www. is a DIFFERENT host
      (5L, "http://b.example.org/private"),     // kept: no rules for host b
      (6L, "http://A.EXAMPLE.ORG:8080/private"),// blocked: host lowercases, port ignored
    ).toDF("doc_id", "url")
    val kept = Urls.robotsScreen(urls, "url", rules)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(3L, 4L, 5L), s"got $kept")
  }

  test("robotsScreen plan: hosts-sized rule side broadcasts, anti-join stays hashed") {
    // the 100 TB claim: the rule side is |hosts|-scale and BROADCASTS,
    // so the URL side is one map-side pass — the host equality must be
    // extracted as the hash-join key (a nested-loop anti-join over the
    // corpus would be the silent failure mode this spec pins)
    val rules = Seq(("a.example.org", "/private")).toDF("host", "prefix")
    val urls = (1L to 100L).map(i => (i, s"http://a.example.org/p/$i"))
      .toDF("doc_id", "url")
    val plan = Urls.robotsScreen(urls, "url", rules)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected a broadcast hash anti-join on host:\n${plan.take(800)}")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "the host equality must become the join key, not a residual filter")
  }
}
