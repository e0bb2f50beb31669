package graft.functions

/** RFC 9309 (Robots Exclusion Protocol) group selection and rule
  * matching — the "may I even ingest this page" gate a crawl pipeline
  * applies before any content gate. Pure JDK string walking (the
  * Biff/Mp4 from-the-public-spec discipline), deterministic, and cheap
  * enough to run per row inside codegen: one robots.txt is typically
  * under a few KB and repeats per site, and the evaluator allocates
  * only the parsed rule list.
  *
  * Semantics implemented (RFC 9309 §2, with the documented practical
  * choice where the RFC leaves room):
  *   - lines are `field: value` records; `#` starts a comment; field
  *     names are case-insensitive; unknown fields are ignored;
  *   - consecutive `User-agent` lines open ONE group sharing the rules
  *     that follow; a `User-agent` line after rules starts a new group;
  *     rules before any `User-agent` line belong to no group (ignored);
  *   - group selection: a group matches the crawler when one of its
  *     agent tokens is a case-insensitive PREFIX of the crawler's
  *     product token (`FooBot/2.1` is matched by `foobot`); the group
  *     with the LONGEST matching token wins; `*` matches everything at
  *     specificity −1 (any named match beats it); if several groups tie
  *     on specificity their rules are evaluated together (RFC: groups
  *     for the same agent are combinable);
  *   - rule matching: `Allow`/`Disallow` values are path patterns
  *     matched against the URL path from its start, `*` matches any
  *     span, a trailing `$` anchors the end; an empty `Disallow:` is a
  *     no-op rule; percent-encoding is compared verbatim (callers
  *     canonicalize with [[UrlFunctions.urlCanonicalize]] first);
  *   - decision: among matching rules the LONGEST pattern wins
  *     (octet-length specificity, per the RFC), `Allow` winning exact
  *     ties; no matching rule — or no matching group, or an empty/blank
  *     robots.txt — means allowed (the protocol is opt-out).
  */
object Robots {

  private final case class Rule(allow: Boolean, pattern: String)

  /** Does `pattern` (with `*` wildcards, optional trailing `$` anchor)
    * match a PREFIX of `path` (or, with `$`, exactly reach its end)?
    * Greedy star-advance walk — linear in practice, no regex. */
  private[functions] def patternMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.charAt(pattern.length - 1) == '$'
    val p = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    val parts = splitStar(p)
    var pos = 0
    var i = 0
    while (i < parts.length) {
      val seg = parts(i)
      if (i == 0) {
        // first segment must match at the very start (patterns are
        // start-anchored per the RFC)
        if (!path.startsWith(seg, 0)) return false
        pos = seg.length
      } else if (seg.isEmpty) {
        // consecutive '*' or trailing '*': matches the empty span
      } else if (i == parts.length - 1 && anchored) {
        // last segment with an end anchor: must match at the END
        if (!(path.length - pos >= seg.length && path.endsWith(seg)))
          return false
        pos = path.length
        i += 1
        // loop exits; the anchor check below sees pos == path.length
        return true
      } else {
        val at = path.indexOf(seg, pos)
        if (at < 0) return false
        pos = at + seg.length
      }
      i += 1
    }
    if (anchored) {
      // no '*' segments consumed the tail (single-segment anchored
      // pattern, or anchor after a literal): require exact end
      if (parts.length == 1) pos == path.length
      // anchored multi-segment patterns ending in '*': '*$' reaches any
      // end — always true once segments matched
      else parts.last.isEmpty || pos == path.length
    } else true
  }

  /** `s.split("\\*", -1)` without regex. */
  private def splitStar(s: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    var i = s.indexOf('*')
    while (i >= 0) {
      out += s.substring(start, i)
      start = i + 1
      i = s.indexOf('*', start)
    }
    out += s.substring(start)
    out.toArray
  }

  /** The rules of the best-matching group(s) for `agent` (lowercase
    * product token). */
  private def selectRules(robotsTxt: String, agentLower: String): List[Rule] = {
    var bestSpec = Int.MinValue
    var best = List.empty[Rule] // reversed
    var curAgents = List.empty[String]
    var curSpec = Int.MinValue
    var inRules = false
    var collecting = false

    def groupSpec(agents: List[String]): Int = {
      var s = Int.MinValue
      agents.foreach { a =>
        if (a == "*") s = math.max(s, -1)
        else if (agentLower.startsWith(a)) s = math.max(s, a.length)
      }
      s
    }

    robotsTxt.split("\n", -1).foreach { raw =>
      val noComment = {
        val h = raw.indexOf('#')
        if (h >= 0) raw.substring(0, h) else raw
      }
      val line = noComment.trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val field = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        field match {
          case "user-agent" =>
            if (inRules) { // new group starts
              curAgents = Nil
              inRules = false
            }
            curAgents = value.toLowerCase :: curAgents
            curSpec = groupSpec(curAgents)
            collecting = curSpec > bestSpec || (curSpec == bestSpec && curSpec != Int.MinValue)
            if (curSpec > bestSpec) {
              bestSpec = curSpec
              best = Nil // a strictly better group replaces prior rules
            }
          case "allow" | "disallow" =>
            inRules = true
            if (collecting && curSpec == bestSpec && curSpec != Int.MinValue) {
              // empty Disallow is a no-op; empty Allow likewise
              if (value.nonEmpty) best = Rule(field == "allow", value) :: best
            }
          case _ => // crawl-delay, sitemap, unknown: ignored
        }
      }
    }
    best.reverse
  }

  /** TRUE iff `agent` may fetch `path` under `robotsTxt`. Called from
    * generated code — keep the signature JVM-primitive-friendly. */
  def allowed(robotsTxt: String, path: String, agent: String): Boolean = {
    if (robotsTxt == null || robotsTxt.isEmpty) return true
    val p = if (path == null || path.isEmpty) "/" else path
    val rules = selectRules(robotsTxt, agent.toLowerCase)
    var bestLen = -1
    var bestAllow = true
    rules.foreach { r =>
      if (patternMatches(r.pattern, p)) {
        val len = r.pattern.length
        if (len > bestLen || (len == bestLen && r.allow && !bestAllow)) {
          if (len > bestLen) { bestLen = len; bestAllow = r.allow }
          else bestAllow = true // tie: Allow wins
        }
      }
    }
    bestAllow
  }
}
