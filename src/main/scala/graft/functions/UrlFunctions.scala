package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
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
    * an absolute URL). Bracketed IPv6 literals (`[::1]`) are kept whole
    * (brackets included — the RFC 3986 host spelling), since the
    * generic cut-at-first-colon rule would truncate them to `[`;
    * punycode (`xn--`) hosts need no special casing, they are plain
    * LDH labels. */
  def urlHost(c: Column): Column = {
    val auth = regexp_extract(c, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    val noUser = regexp_replace(auth, "^[^@]*@", "")
    val v6 = regexp_extract(noUser, "^(\\[[^\\]]*\\])", 1)
    lower(when(v6 =!= "", v6).otherwise(regexp_extract(noUser, "^([^:]*)", 1)))
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
    * bare names, case-INsensitively (`(?i)` is RE2- and Java-portable):
    * trackers arrive as `UTM_SOURCE=`/`Fbclid=` too, and a
    * case-sensitive match would leave distinct canonical URLs for the
    * same page. The generic `ref` is deliberately NOT in the default
    * list — sites use it for real routing (VCS branch refs, anchors);
    * deployments that want it gone pass a custom pattern to the
    * [[urlCanonicalize(c:org\.apache\.spark\.sql\.Column,trackingPattern:String)*]]
    * overload. */
  val TrackingParamPattern = "(?i)^(utm_[a-z]*|fbclid|gclid|msclkid|mc_cid|mc_eid)(=.*)?$"

  /** Canonical form: lowercase scheme+host, userinfo stripped, default
    * ports (http:80, https:443) stripped, duplicate-slash/trailing-slash
    * path normalization, fragment dropped, tracking params dropped
    * (remaining params keep their original order — re-sorting would
    * conflate ?a=1&b=2 pages with ?b=2&a=1 pages on sites where order
    * matters). Non-absolute inputs pass through trimmed. */
  def urlCanonicalize(c: Column): Column =
    urlCanonicalize(c, TrackingParamPattern)

  /** [[urlCanonicalize(c:org\.apache\.spark\.sql\.Column)*]] with a
    * caller-supplied tracking-parameter pattern (matched against each
    * `name=value` / bare-name query token) — e.g. the default plus
    * `|ref` for deployments that treat `ref=` as tracking. */
  def urlCanonicalize(c: Column, trackingPattern: String): Column = {
    val t = trim(c)
    val noFrag = regexp_replace(t, "#.*$", "")
    val base = regexp_extract(noFrag, "^([^?]*)", 1)
    val query = regexp_extract(noFrag, "^[^?]*\\?(.*)$", 1)
    val scheme = urlScheme(base)
    val afterScheme = regexp_replace(base, "^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    val hostPort = regexp_replace(regexp_extract(afterScheme, "^([^/]*)", 1), "^[^@]*@", "")
    // bracketed IPv6 literals keep their brackets; the :port$ regex is
    // already safe for them (a bare `[::1]` ends in `]`, never digits)
    val v6 = regexp_extract(hostPort, "^(\\[[^\\]]*\\])", 1)
    val host = lower(when(v6 =!= "", v6)
      .otherwise(regexp_extract(hostPort, "^([^:]*)", 1)))
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val portPart = when(port === "", lit(""))
      .when(scheme === "http" && port === "80", lit(""))
      .when(scheme === "https" && port === "443", lit(""))
      .otherwise(concat(lit(":"), port))
    val path = canonicalPath(regexp_replace(afterScheme, "^[^/]*", ""))
    val kept = filter(split(query, "&"),
      p => !(p === "") && !p.rlike(trackingPattern))
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

  /** [[registrableDomain]] driven by a caller-supplied public-suffix
    * list instead of the built-in 20-entry subset — the deployment-grade
    * path: without the full list, `com.ar`/`co.id`-class hosts get a
    * silently wrong pay-level domain. `psl` holds one rule per row in
    * its first string column, publicsuffix.org syntax: plain suffixes
    * (`com`, `co.uk`), wildcards (`*.ck` — every direct child of `ck`
    * is a public suffix), exceptions (`!www.ck` — carved back out of a
    * wildcard); `//`-comment and blank lines are ignored, so the
    * official file loads verbatim via `spark.read.text`.
    *
    * Semantics follow the published algorithm: among matching rules an
    * exception prevails, else the longest; the registrable domain is
    * the public suffix plus one host label (null when the host IS a
    * public suffix). Hosts matching NO rule fall back to the built-in
    * [[registrableDomain]] (rather than the spec's implicit `*` default
    * — the subset's 3-label answers beat last-two-labels there).
    *
    * Scale shape: the list (~10k rules, bounded below) collects ONCE at
    * plan-build time into three hash sets and ships as a broadcast; the
    * per-row probe is a pure map-side suffix walk (≤ labels lookups, no
    * join, no shuffle). A UDF is justified here like the span-scrub
    * kernel: the walk is an imperative loop over a broadcast structure
    * that no built-in expression reaches. */
  /** Domain-blocklist gate (the crawl-curation "never ingest these
    * sites" rule): TRUE iff the host's registrable domain is NOT on
    * the list. Matches at the PAY-LEVEL domain ([[registrableDomain]]),
    * so every subdomain of a listed site is blocked with it —
    * blocklists name sites, not hosts. List entries are lowercased at
    * plan build; the comparison is a codegen'd `isin` over the literal
    * list (site blocklists are 10³–10⁵ entries; beyond that, use a
    * broadcast anti-join). Null host yields null (dropped by `where`,
    * the gate convention). */
  def domainNotBlocklisted(host: Column, domains: Seq[String]): Column = {
    require(domains.nonEmpty, "empty blocklist — drop the gate instead")
    // registrableDomain preserves the host's case; fold both sides
    !lower(registrableDomain(host)).isin(domains.map(_.trim.toLowerCase): _*)
  }

  def registrableDomainWith(host: Column, psl: DataFrame): Column = {
    val ruleCol = psl.columns.head
    val raw = psl.select(col(ruleCol).cast("string")).na.drop()
      .collect().iterator.map(_.getString(0).trim.toLowerCase)
      .filter(r => r.nonEmpty && !r.startsWith("//")).toArray
    require(raw.length <= 1000000,
      s"public-suffix list implausibly large (${raw.length} rules) — wrong input?")
    val exc = raw.iterator.filter(_.startsWith("!")).map(_.substring(1)).toSet
    val wild = raw.iterator.filter(_.startsWith("*.")).map(_.substring(2)).toSet
    val plain = raw.iterator.filterNot(r => r.startsWith("!") || r.startsWith("*.")).toSet
    val bc = psl.sparkSession.sparkContext.broadcast((plain, wild, exc))
    // UDF contract: null → unmatched (fallback applies), "" → matched
    // with no registrable domain (host is itself a public suffix)
    val look = udf { (h: String) =>
      if (h == null) null
      else {
        val (p, w, e) = bc.value
        val labels = h.toLowerCase.split('.')
        val n = labels.length
        var ps = -1
        var excHit: String = null
        var k = 1
        while (k <= n && excHit == null) {
          val s = labels.slice(n - k, n).mkString(".")
          if (e.contains(s)) excHit = s
          else {
            if (p.contains(s) && k > ps) ps = k
            if (k < n && w.contains(s) && k + 1 > ps) ps = k + 1
          }
          k += 1
        }
        if (excHit != null) excHit
        else if (ps < 0) null
        else if (n >= ps + 1) labels.slice(n - ps - 1, n).mkString(".")
        else ""
      }
    }
    val r = look(host)
    when(r.isNull, registrableDomain(host))
      .when(r === "", lit(null).cast("string"))
      .otherwise(r)
  }

  /** Path + query of an absolute URL, the octets RFC 9309 rules match
    * against (fragments are client-side; robots patterns see
    * `/path?query`). "" path → "/" (a bare `https://h` fetch is the
    * root); non-absolute inputs yield "/" too rather than matching
    * garbage against site rules. */
  def urlPathQuery(c: Column): Column = {
    val rest = regexp_extract(c, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)", 1)
    when(rest === "" , "/")
      .when(substring(rest, 1, 1) === "?", concat(lit("/"), rest))
      .otherwise(rest)
  }

  /** RFC 9309 robots.txt gate (see [[graft.functions.Robots]] for the
    * exact semantics): TRUE iff `agent` may fetch the page whose
    * path+query is `path`, under `robotsTxt` (the site's robots file,
    * joined onto the frame per registrable domain — one broadcast-sized
    * robots snapshot serves any corpus). Null robots/path → null
    * (coalesce the robots column to '' for "no robots file = allowed").
    * Native codegen'd expression; the agent token is baked in at plan
    * build. */
  def robotsAllowed(robotsTxt: Column, path: Column,
      agent: String = "graftbot"): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.plans.RobotsAllowedExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(robotsTxt),
        org.apache.spark.sql.GraftColumnBridge.expression(path), agent))
}
