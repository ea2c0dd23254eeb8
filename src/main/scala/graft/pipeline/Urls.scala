package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus curation — the step before URL
  * dedup and host-level capping (crawl pipelines drop ~half their raw
  * fetches as URL-level duplicates once tracking params and case noise
  * are stripped; see the reference's connector-side cleaning for the
  * spirit, not the mechanics — this layer has no pandas counterpart).
  *
  * Everything here is a pure `Column` expression (regexp chains —
  * codegen'd, no UDF, no higher-order array lambdas per the repo rule),
  * so normalization rides inside whole-stage codegen in the scan
  * projection and is replayable in an external engine for the oracle.
  *
  * Normalization contract (deliberately conservative — semantics-
  * preserving transforms only):
  *  - scheme and host lowercase; userinfo (`user@`) dropped
  *  - default ports stripped (`:80` for http, `:443` for https)
  *  - fragment dropped
  *  - tracking query params dropped (`utm_*`, `gclid`, `fbclid`,
  *    `msclkid`, `mc_eid`, `igshid`), separators re-tidied, a
  *    now-empty query dropped
  *  - empty path becomes `/`
  *  - query-param ORDER IS KEPT (sorting params needs an array
  *    round-trip that breaks codegen, and reordering changes semantics
  *    on some endpoints — callers wanting aggressive key-sorted
  *    canonicalization do it off the hot path)
  *
  * A non-URL string normalizes to itself minus a fragment-lookalike
  * suffix — garbage in, garbage out, no nulls introduced. Bracketed
  * IPv6 authorities (`http://[::1]:8080/`) are out of scope: the
  * host/port split assumes the registered-name grammar crawl URLs use.
  */
object Urls {

  private val SchemeRe = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
  private val HostPortRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]*)"
  private val TrackingRe =
    "(?i)([?&])(utm_[a-z0-9_]*|gclid|fbclid|msclkid|mc_eid|igshid)=[^&#]*"

  /** Lowercased host (no port, no userinfo); '' for non-URLs. */
  def hostOf(url: Column): Column =
    lower(regexp_extract(regexp_extract(url, HostPortRe, 1), "^([^:]*)", 1))

  /** [[hostOf]] minus a leading `www.` — the key host-level dedup and
    * per-host capping group by (www/apex splits are one site). */
  def registrableHost(url: Column): Column =
    regexp_replace(hostOf(url), "^www\\.", "")

  /** Path component (no query, no fragment); '/' when absent. */
  def pathOf(url: Column): Column = {
    val p = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    when(p === "", lit("/")).otherwise(p)
  }

  /** Parse `robots.txt` bodies into the Disallow prefix rules that
    * apply to user-agent `*` — the crawl-politeness screen every
    * archive pipeline runs before fetching or keeping a page (REP,
    * RFC 9309 subset).
    *
    * Grammar handled (the subset real crawl pipelines enforce):
    * `#` comments stripped; a GROUP is one or more consecutive
    * `User-agent:` lines followed by its rules, so
    * `User-agent: a\nUser-agent: *\nDisallow: /x` applies to `*`;
    * groups for other agents are ignored; an empty `Disallow:` means
    * allow-all and produces no rule; `Allow:` precedence is NOT
    * implemented — this screen is deliberately conservative (a page a
    * nested Allow would readmit stays dropped).
    *
    * Scale shape: one posexplode of the robots bodies plus two
    * windows partitioned by HOST — a robots file is KB-sized by
    * convention, so per-host work is bounded no matter the corpus;
    * the output rule set is |hosts|-scale, the natural broadcast side
    * of [[robotsScreen]].
    *
    * @return (host, prefix) distinct Disallow rules for agent `*`
    */
  def robotsDisallows(
      robots: DataFrame, hostCol: String, txtCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("host").orderBy(col("pos"))
    val lines = robots
      .select(col(hostCol).as("host"),
        posexplode(split(col(txtCol), "\n")).as(Seq("pos", "raw")))
      .withColumn("line", trim(regexp_replace(col("raw"), "#.*$", "")))
      .withColumn("is_ua",
        startswith(lower(col("line")), lit("user-agent:")))
      .withColumn("ua",
        when(col("is_ua"),
          trim(regexp_extract(col("line"), "(?i)^user-agent:(.*)$", 1))))
      .withColumn("prefix",
        when(startswith(lower(col("line")), lit("disallow:")),
          trim(regexp_extract(col("line"), "(?i)^disallow:(.*)$", 1))))
    // group id: a group starts at a user-agent line whose predecessor
    // is not one (consecutive UA lines share the group header)
    val grouped = lines
      .withColumn("grp", sum(
        when(col("is_ua") &&
          !coalesce(lag(col("is_ua"), 1).over(w), lit(false)), 1L)
          .otherwise(0L)).over(w))
    val starGroups = grouped.where(col("ua") === "*")
      .select("host", "grp").distinct()
    grouped
      .where(col("prefix").isNotNull && col("prefix") =!= "")
      .join(starGroups, Seq("host", "grp"), "left_semi")
      .select("host", "prefix").distinct()
  }

  /** Drop URLs a [[robotsDisallows]] rule set forbids: a URL is
    * disallowed iff a rule for its EXACT host (robots scope is the
    * origin — `www.x` and `x` are different hosts) prefix-matches its
    * path. One anti-join, equi on host with the prefix predicate as
    * the residual — the rule side is |hosts|-scale, so at corpus
    * scale this broadcasts and the screen stays map-side.
    */
  def robotsScreen(
      urls: DataFrame, urlCol: String, rules: DataFrame): DataFrame = {
    val r = rules.select(col("host").as("__r_host"),
      col("prefix").as("__r_prefix"))
    urls.join(broadcast(r),
      hostOf(col(urlCol)) === col("__r_host") &&
        startswith(pathOf(col(urlCol)), col("__r_prefix")),
      "left_anti")
  }

  /** Canonical form per the contract above. */
  def normalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, SchemeRe, 1))
    val hostPort = regexp_extract(url, HostPortRe, 1)
    val host = hostOf(url)
    val port = regexp_extract(hostPort, ":(\\d+)$", 1)
    val keepPort = port =!= "" &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    // everything after host:port, fragment dropped
    val rest = regexp_extract(url,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)", 1)
    val untracked = regexp_replace(rest, TrackingRe, "$1")
    val tidied = regexp_replace(
      regexp_replace(regexp_replace(untracked, "\\?&+", "?"), "&&+", "&"),
      "[?&]+$", "")
    val path = when(tidied === "" || startswith(tidied, lit("?")),
      concat(lit("/"), tidied)).otherwise(tidied)
    when(scheme === "", regexp_replace(url, "#.*$", ""))
      .otherwise(concat(
        scheme, lit("://"), host,
        when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
        path))
  }
}
