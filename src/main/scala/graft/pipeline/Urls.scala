package graft.pipeline

import org.apache.spark.sql.Column
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
