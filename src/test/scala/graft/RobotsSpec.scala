package graft

import graft.functions.Robots
import graft.functions.UrlFunctions
import org.apache.spark.sql.functions._

/** RFC 9309 robots.txt evaluation: pattern matching (wildcards, end
  * anchor), longest-match/Allow-wins precedence, group selection,
  * parse robustness, and the native expression through a frame. */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private def ok(robots: String, path: String, agent: String = "foobot") =
    Robots.allowed(robots, path, agent)

  test("pattern matching: prefix, wildcard, end anchor") {
    val r = "User-agent: *\nDisallow: /private\n"
    assert(!ok(r, "/private"))
    assert(!ok(r, "/private/page"))
    assert(!ok(r, "/privateer")) // prefix octets match, per the RFC
    assert(ok(r, "/public"))
    val gif = "User-agent: *\nDisallow: /*.gif$\n"
    assert(!ok(gif, "/a.gif"))
    assert(!ok(gif, "/img/deep/b.gif"))
    assert(ok(gif, "/a.gifx")) // anchor: .gif must END the path
    assert(ok(gif, "/a.png"))
    val mid = "User-agent: *\nDisallow: /a*b\n"
    assert(!ok(mid, "/ab"))
    assert(!ok(mid, "/a-x-b-tail"))
    assert(ok(mid, "/b-a"))
  }

  test("precedence: longest match wins; Allow wins exact ties") {
    // RFC 9309 §2.2.2 examples
    val r1 = "User-agent: *\nAllow: /page\nDisallow: /\n"
    assert(ok(r1, "/page"))
    assert(!ok(r1, "/other"))
    val r2 = "User-agent: *\nAllow: /folder\nDisallow: /folder\n"
    assert(ok(r2, "/folder/page")) // equal length: Allow wins
    val r3 = "User-agent: *\nAllow: /page\nDisallow: /*.ph\n"
    assert(ok(r3, "/page.php5")) // both length 5: Allow wins
    val r4 = "User-agent: *\nAllow: /$\nDisallow: /\n"
    assert(ok(r4, "/")) // /$ (len 2) beats / (len 1) on root
    assert(!ok(r4, "/page")) // anchor doesn't match; Disallow / does
  }

  test("group selection: longest agent prefix wins; * is the fallback") {
    val r =
      """User-agent: *
        |Disallow: /all
        |
        |User-agent: foobot
        |Disallow: /foo
        |
        |User-agent: foobot-news
        |Disallow: /news
        |""".stripMargin
    // plain foobot: its group only (not *, not the longer token's group)
    assert(!ok(r, "/foo", "foobot"))
    assert(ok(r, "/all", "foobot"))
    assert(ok(r, "/news", "foobot"))
    // foobot-news/1.0 matches both named groups; the LONGEST token wins
    assert(!ok(r, "/news", "foobot-news/1.0"))
    assert(ok(r, "/foo", "foobot-news/1.0"))
    // unrelated crawler falls back to *
    assert(!ok(r, "/all", "otherbot"))
    assert(ok(r, "/foo", "otherbot"))
    // crawler with NO matching group and no * group: allowed
    val named = "User-agent: foobot\nDisallow: /\n"
    assert(ok(named, "/anything", "otherbot"))
    assert(!ok(named, "/anything", "foobot/2.1")) // product-token prefix
  }

  test("consecutive User-agent lines share one rule block; a UA line after rules starts a new group") {
    val r =
      """User-agent: abot
        |User-agent: foobot
        |Disallow: /shared
        |User-agent: cbot
        |Disallow: /conly
        |""".stripMargin
    assert(!ok(r, "/shared", "foobot"))
    assert(!ok(r, "/shared", "abot"))
    assert(ok(r, "/conly", "foobot")) // cbot's group, not foobot's
    assert(!ok(r, "/conly", "cbot"))
    assert(ok(r, "/shared", "cbot"))
  }

  test("parse robustness: comments, case-insensitive fields, unknown fields, empty Disallow, blank/empty robots") {
    val r =
      """# site robots
        |USER-AGENT: FooBot   # inline comment
        |Crawl-delay: 10
        |DISALLOW: /Hidden
        |Disallow:
        |Sitemap: https://example.com/sitemap.xml
        |""".stripMargin
    assert(!ok(r, "/Hidden"))
    assert(ok(r, "/hidden")) // path patterns are case-SENSITIVE
    assert(ok(r, "/open")) // empty Disallow is a no-op, not disallow-all
    assert(ok("", "/anything"))
    assert(ok("   \n  \n", "/anything"))
    assert(ok(null, "/anything"))
    // rules before any User-agent line belong to no group
    assert(ok("Disallow: /\n", "/page"))
  }

  test("the native expression gates a frame; null contract; agent charset validated") {
    val robots = "User-agent: *\nAllow: /pub\nDisallow: /\n"
    val df = Seq(
      (1L, robots, "https://ex.com/pub/a"),
      (2L, robots, "https://ex.com/secret"),
      (3L, null.asInstanceOf[String], "https://ex.com/anything"),
      (4L, robots, "https://ex.com"),
      (5L, robots, "https://ex.com/?q=1")
    ).toDF("id", "robots", "url")
    val out = df.select(col("id"), UrlFunctions.robotsAllowed(
        col("robots"), UrlFunctions.urlPathQuery(col("url"))).as("a"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getBoolean(1))).toMap
    assert(out(1L) == true)
    assert(out(2L) == false)
    assert(out(3L) == null) // null robots -> null (coalesce to '' upstream)
    assert(out(4L) == false) // bare host -> path "/", Disallow / wins
    assert(out(5L) == false) // "/?q=1": query octets are matched
    // coalesce-to-empty = no robots file = allowed
    val out3 = df.where(col("id") === 3).select(UrlFunctions.robotsAllowed(
        coalesce(col("robots"), lit("")), UrlFunctions.urlPathQuery(col("url"))))
      .collect().head.getBoolean(0)
    assert(out3)
    val ex = intercept[Exception] {
      df.select(UrlFunctions.robotsAllowed(col("robots"),
        UrlFunctions.urlPathQuery(col("url")), agent = "bad agent!")).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("product token"))
  }

  test("urlPathQuery: path+query octets, fragment dropped, degenerate inputs") {
    val df = Seq(
      "https://ex.com/a/b?x=1#frag",
      "https://ex.com",
      "https://ex.com/?q=2",
      "not a url"
    ).toDF("url")
    val got = df.select(UrlFunctions.urlPathQuery(col("url")))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("/a/b?x=1", "/", "/?q=2", "/"))
  }
}
