package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL normalization for web-crawl curation (north-star extension —
  * SURVEY.md §2.13): the C4/CCNet-family pipelines deduplicate and
  * quota by URL and registrable domain, so the engine needs
  * deterministic, codegen-friendly URL canonicalization that two
  * engines can agree on. All functions are pure Column expression
  * chains (whole-stage codegen, RE2-portable regexes — no lookarounds,
  * no backreferences in patterns), so they fuse into the document scan
  * like the rest of [[TextFunctions]].
  *
  * Scope: absolute http(s)-style URLs (`scheme://...`). Inputs without
  * a scheme pass through trimmed-and-unchanged rather than erroring —
  * crawl metadata contains garbage and a scrub column must be total.
  */
object UrlFunctions {

  private def hasScheme(c: Column): Column = c.rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://")

  /** Lowercased scheme ("" when the input is not an absolute URL). */
  def urlScheme(c: Column): Column =
    lower(regexp_extract(c, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))

  /** Lowercased host: authority minus userinfo and port ("" when not
    * an absolute URL). */
  def urlHost(c: Column): Column = {
    val auth = regexp_extract(c, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    val noUser = regexp_replace(auth, "^[^@]*@", "")
    lower(regexp_extract(noUser, "^([^:]*)", 1))
  }

  /** Path component with duplicate slashes collapsed and the trailing
    * slash stripped (root stays "/"); "" input → "/" (the canonical
    * empty path). Case is preserved — paths are case-significant. */
  private def canonicalPath(path: Column): Column = {
    val collapsed = regexp_replace(path, "/{2,}", "/")
    val stripped = regexp_replace(collapsed, "/$", "")
    when(stripped === "", "/").otherwise(stripped)
  }

  /** Query-parameter prefixes dropped by canonicalization: the
    * session/click-tracking families that make one page infinite URLs
    * (the C4-era dedup blockers). Matched against "name=" prefixes and
    * bare names. */
  val TrackingParamPattern = "^(utm_[a-z]*|fbclid|gclid|msclkid|ref|mc_cid|mc_eid)(=.*)?$"

  /** Canonical form: lowercase scheme+host, userinfo stripped, default
    * ports (http:80, https:443) stripped, duplicate-slash/trailing-slash
    * path normalization, fragment dropped, tracking params dropped
    * (remaining params keep their original order — re-sorting would
    * conflate ?a=1&b=2 pages with ?b=2&a=1 pages on sites where order
    * matters). Non-absolute inputs pass through trimmed. */
  def urlCanonicalize(c: Column): Column = {
    val t = trim(c)
    val noFrag = regexp_replace(t, "#.*$", "")
    val base = regexp_extract(noFrag, "^([^?]*)", 1)
    val query = regexp_extract(noFrag, "^[^?]*\\?(.*)$", 1)
    val scheme = urlScheme(base)
    val afterScheme = regexp_replace(base, "^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    val hostPort = regexp_replace(regexp_extract(afterScheme, "^([^/]*)", 1), "^[^@]*@", "")
    val host = lower(regexp_extract(hostPort, "^([^:]*)", 1))
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val portPart = when(port === "", lit(""))
      .when(scheme === "http" && port === "80", lit(""))
      .when(scheme === "https" && port === "443", lit(""))
      .otherwise(concat(lit(":"), port))
    val path = canonicalPath(regexp_replace(afterScheme, "^[^/]*", ""))
    val kept = filter(split(query, "&"),
      p => !(p === "") && !p.rlike(TrackingParamPattern))
    val queryPart = when(size(kept) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(kept, "&")))
    when(hasScheme(t),
      concat(scheme, lit("://"), host, portPart, path, queryPart))
      .otherwise(t)
  }

  /** Two-label public suffixes where the registrable domain needs THREE
    * labels (a pragmatic subset of the public-suffix list — the full
    * list is a data file a deployment ships as a broadcast lookup; this
    * built-in set keeps the function dependency-free and deterministic). */
  val MultiPartTlds: Seq[String] = Seq(
    "co.uk", "ac.uk", "gov.uk", "org.uk", "me.uk", "co.jp", "ne.jp",
    "or.jp", "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx",
    "co.in", "co.kr", "co.nz", "com.sg", "com.tr", "co.za")

  /** Registrable ("pay-level") domain of a host: last two labels, or
    * last three when the two-label tail is a multi-part public suffix.
    * Hosts with ≤ 2 labels (incl. bare/IP-ish hosts) pass through. */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    // explicit null passthrough: concat_ws below SKIPS nulls, so without
    // the guard a null host would canonicalize to "" instead of null
    when(host.isNull, lit(null).cast("string")).when(n <= 2, host).otherwise {
      val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
      val last3 = concat_ws(".", element_at(labels, -3), last2)
      when(array_contains(array(MultiPartTlds.map(lit): _*), last2), last3)
        .otherwise(last2)
    }
  }
}
