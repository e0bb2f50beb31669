package graft

import graft.functions.UrlFunctions._
import org.apache.spark.sql.functions._

class UrlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(urlCanonicalize(col("u"))).collect().map(_.getString(0)).toSeq

  test("canonicalize: case, default ports, userinfo, fragment, tracking params") {
    assert(canon("HTTP://WWW.Example.COM:80/A//B/?utm_source=x&id=1#frag")
      == Seq("http://www.example.com/A/B?id=1"))
    assert(canon("https://u:p@Host.Example.ORG:443/x/") == Seq("https://host.example.org/x"))
    // non-default port survives; param order preserved
    assert(canon("https://h.example.com:8443/p?b=2&a=1") ==
      Seq("https://h.example.com:8443/p?b=2&a=1"))
    // all params tracking -> no query part; empty path -> "/"
    assert(canon("https://E.net?utm_campaign=z&gclid=1") == Seq("https://e.net/"))
    // bare tracking name without "=" also dropped; ref= dropped
    assert(canon("http://a.com/p?fbclid&ref=home&keep=1") == Seq("http://a.com/p?keep=1"))
  }

  test("canonicalize is total: non-URL inputs pass through trimmed") {
    assert(canon("  not a url  ", "relative/path?x=1", "") ==
      Seq("not a url", "relative/path?x=1", ""))
  }

  test("canonicalize is idempotent on its own output") {
    val messy = Seq(
      "HTTP://WWW.Example.COM:80/Docs//9/?utm_source=feed&id=9#frag",
      "https://user:pw@News.Example.co.uk:443/Article?id=3&fbclid=a&page=2",
      "https://cdn.example.org:8080/a//b///7",
      "https://Example.net/?gclid=x&q=4&utm_campaign=z")
    val once = canon(messy: _*)
    assert(canon(once: _*) == once)
  }

  test("host extraction strips userinfo and port, lowercases") {
    val hosts = Seq("https://U:P@Www.EXAMPLE.co.uk:8443/x?y#z", "http://10.1.2.3:8080/",
      "nota url")
      .toDF("u").select(urlHost(col("u"))).collect().map(_.getString(0)).toSeq
    assert(hosts == Seq("www.example.co.uk", "10.1.2.3", ""))
  }

  test("registrable domain: plain and multi-part TLDs, short hosts pass through") {
    val doms = Seq("www.news.example.co.uk", "a.b.example.com", "example.com",
      "localhost", "deep.sub.co.jp")
      .toDF("h").select(registrableDomain(col("h"))).collect().map(_.getString(0)).toSeq
    assert(doms == Seq("example.co.uk", "example.com", "example.com",
      "localhost", "sub.co.jp"))
  }
}
