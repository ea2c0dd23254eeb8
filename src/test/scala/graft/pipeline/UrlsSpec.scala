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
      .select("host", "prefix", "allow")
      .as[(String, String, Boolean)].collect().toSet
    assert(rules == Set(
      ("a.example.org", "/private", false),
      ("a.example.org", "/tmp", false)),
      s"only the *-group's non-empty Disallows apply: $rules")

    // a robots body with no *-group yields no rules at all
    val none = Urls.robotsDisallows(
      Seq(("b.example.org", "User-agent: x\nDisallow: /"))
        .toDF("host", "robots"), "host", "robots").count()
    assert(none == 0)
  }

  test("robotsDisallows: multiple captures of one host parse independently") {
    // r17 ADVICE: curateArchive feeds EVERY */robots.txt capture keyed
    // by host — http+https duals and re-fetches give one host several
    // bodies. A host-only parse window interleaved their lines on tied
    // pos and cross-attached rules to the wrong User-agent groups.
    val bodyA = Seq( // the OTHER agent owns /x here
      "User-agent: otherbot",
      "Disallow: /x",
    ).mkString("\n")
    val bodyB = Seq( // the *-group owns /y here
      "User-agent: *",
      "Disallow: /y",
    ).mkString("\n")
    val rules = Urls.robotsDisallows(
      Seq(("h.example.org", bodyA), ("h.example.org", bodyB))
        .toDF("host", "robots"), "host", "robots")
      .select("host", "prefix").as[(String, String)].collect().toSet
    assert(rules == Set(("h.example.org", "/y")),
      s"bodyA's other-agent rule must never attach to bodyB's *-group: $rules")
    // byte-identical dual captures collapse to one rule set
    val dual = Urls.robotsDisallows(
      Seq(("h.example.org", bodyB), ("h.example.org", bodyB))
        .toDF("host", "robots"), "host", "robots").count()
    assert(dual == 1L, "identical captures must not duplicate rules")
  }

  test("robotsDisallows: RFC 9309 wildcards compile, Allow lines carry their verdict") {
    val txt = Seq(
      "User-agent: *",
      "Disallow: /*.php",   // mid-path wildcard
      "Disallow: /exact$",  // end anchor
      "Disallow: /a*b$",    // both
      "Allow: /public",     // plain allow
      "Disallow: /plain",   // plain disallow: pattern stays null
    ).mkString("\n")
    val rules = Urls.robotsDisallows(
      Seq(("w.example.org", txt)).toDF("host", "robots"), "host", "robots")
      .select("prefix", "pattern", "speclen", "allow")
      .as[(String, Option[String], Int, Boolean)].collect().toSet
    assert(rules == Set(
      ("/", Some("^/.*\\.php"), 6, false),
      ("/exact", Some("^/exact$"), 7, false),
      ("/a", Some("^/a.*b$"), 5, false),
      ("/public", None, 7, true),
      ("/plain", None, 6, false)), s"got $rules")
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

  test("robotsScreen: RFC 9309 longest-match precedence — Allow carve-outs readmit") {
    val txt = Seq(
      "User-agent: *",
      "Disallow: /private",
      "Allow: /private/press", // longer → readmits the press subtree
      "Disallow: /private/press/internal$", // longest → re-blocks one page
      "Allow: /p",            // shorter than /private → loses that tie-break
      "Disallow: /dup",
      "Allow: /dup",          // equal octets: Allow wins the tie per RFC
    ).mkString("\n")
    val rules = Urls.robotsDisallows(
      Seq(("a.example.org", txt)).toDF("host", "robots"), "host", "robots")
    val urls = Seq(
      (1L, "http://a.example.org/private/x"),        // blocked (/private beats /p)
      (2L, "http://a.example.org/private/press/ok"), // kept (Allow carve-out)
      (3L, "http://a.example.org/private/press/internal"), // blocked ($-anchored re-block)
      (4L, "http://a.example.org/private/press/internal2"), // kept ($ stops the re-block)
      (5L, "http://a.example.org/dup"),              // kept (tie → Allow)
      (6L, "http://a.example.org/other"),            // kept (no rule matches)
    ).toDF("doc_id", "url")
    def kept(bc: Boolean) = Urls.robotsScreen(urls, "url", rules,
      broadcastRules = bc, idCol = Some("doc_id"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept(bc = true) == Seq(2L, 4L, 5L, 6L), s"got ${kept(bc = true)}")
    // both regimes decide identically
    assert(kept(bc = false) == kept(bc = true))
  }

  test("robotsScreen: wildcard rules match, not under-block as literal bytes") {
    // r17 ADVICE: 'Disallow: /*.php' matched nothing as a literal
    // prefix — the screen under-blocked exactly the rules real sites
    // lean on
    val txt = Seq(
      "User-agent: *",
      "Disallow: /*.php",
      "Disallow: /a*b",
      "Disallow: /exact$",
    ).mkString("\n")
    val rules = Urls.robotsDisallows(
      Seq(("w.example.org", txt)).toDF("host", "robots"), "host", "robots")
    val urls = Seq(
      (1L, "http://w.example.org/index.php"),   // blocked: /*.php
      (2L, "http://w.example.org/x/run.php?q=1"), // blocked: .php deep in path
      (3L, "http://w.example.org/index.html"),  // kept
      (4L, "http://w.example.org/a/x/b/tail"),  // blocked: /a*b matches a PREFIX
      (5L, "http://w.example.org/a/x/c"),       // kept: no b after a
      (6L, "http://w.example.org/exact"),       // blocked: anchored exact
      (7L, "http://w.example.org/exactly"),     // kept: $ stops the match
    ).toDF("doc_id", "url")
    val kept = Urls.robotsScreen(urls, "url", rules, idCol = Some("doc_id"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(3L, 5L, 7L), s"got $kept")
  }

  test("robotsScreen plan: disallow-only broadcast regime stays a map-side hash anti-join") {
    // when the rule side is small (a per-batch archive screen) the
    // broadcast is right: one map-side pass over the URL side — the
    // host equality must be the hash-join key (a nested-loop anti-join
    // over the corpus would be the silent failure mode this spec pins)
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

  test("robotsScreen plan: scale regime never broadcasts the rules, never nested-loops") {
    // the web-scale regime (r17 VERDICT): agent-* rules over 10⁷–10⁸
    // hosts are multi-GB — the rule side must NOT be forced into a
    // broadcast. The screen joins a narrow projection shuffled on
    // host, and only the blocked keys come back to the payload rows.
    val rules = Seq(("a.example.org", "/private")).toDF("host", "prefix")
    val urls = (1L to 100L).map(i => (i, s"http://a.example.org/p/$i"))
      .toDF("doc_id", "url")
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // forbid every size-based broadcast so the fixture exercises the
      // plan a multi-GB rule table would get
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = Urls.robotsScreen(urls, "url", rules,
        broadcastRules = false, idCol = Some("doc_id"))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"host equality must be a hash-join key:\n${plan.take(900)}")
      assert(!plan.contains("BroadcastExchange"),
        s"nothing may force the hosts-sized rule table into a broadcast:\n${
          plan.take(900)}")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffled hash-equi join on host:\n${plan.take(900)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
