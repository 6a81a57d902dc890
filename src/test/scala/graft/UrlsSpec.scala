package graft

import graft.text.Urls
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class UrlsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(u: String): String =
    Seq(Tuple1(u)).toDF("u")
      .select(graft.functions.expressions.canonicalUrl(col("u")).as("c"))
      .as[String].head()

  test("canonicalUrl: every documented rule, one at a time") {
    // scheme fold + host case
    assert(canon("HTTP://Example.COM/x") == "https://example.com/x")
    // www + default ports
    assert(canon("https://www.example.com:443/x") == "https://example.com/x")
    assert(canon("http://example.com:80/x") == "https://example.com/x")
    // non-default port survives — including the OTHER scheme's default
    assert(canon("https://example.com:8443/x") == "https://example.com:8443/x")
    assert(canon("http://example.com:443/x") == "https://example.com:443/x")
    assert(canon("https://example.com:80/x") == "https://example.com:80/x")
    assert(canon("ftp://example.com:80/x") == "ftp://example.com:80/x")
    // trailing slashes (all of them), root path collapses to bare host
    assert(canon("https://example.com/a/b///") == "https://example.com/a/b")
    assert(canon("https://example.com/") == "https://example.com")
    // fragment dropped; query BEFORE fragment kept
    assert(canon("https://example.com/x?b=2#frag") == "https://example.com/x?b=2")
    // '?' inside the fragment is NOT a query
    assert(canon("https://example.com/x#frag?b=2") == "https://example.com/x")
    // tracking params dropped, survivors sorted, empty '&&' ignored
    assert(canon("https://example.com/x?utm_source=s&b=2&&a=1&gclid=g&fbclid=f&ref=r")
      == "https://example.com/x?a=1&b=2")
    // an emptied query drops its '?'
    assert(canon("https://example.com/x?utm_campaign=z") == "https://example.com/x")
    // utm prefix matches the NAME, not the value
    assert(canon("https://example.com/x?a=utm_source") == "https://example.com/x?a=utm_source")
    // a valueless param keeps/drops by the same name rule
    assert(canon("https://example.com/x?ref&a=1") == "https://example.com/x?a=1")
    // non-http scheme: lowercased, not folded
    assert(canon("FTP://Example.com/f") == "ftp://example.com/f")
    // garbage without '://' lowercases, never throws
    assert(canon("  Not A Url  ") == "not a url")
    assert(canon("") == "")
  }

  test("canonicalUrl r18 rules: userinfo, IPv6 ports, percent, paths, drop-list") {
    // userinfo dropped — split at the LAST '@' ('@' legal in userinfo)
    assert(canon("https://user@www.example.com/x") == "https://example.com/x")
    assert(canon("https://user:p@ss@example.com/x") == "https://example.com/x")
    // bracketed IPv6: internal colons are not ports; a real port is
    assert(canon("https://[2001:db8::1]:443/x") == "https://[2001:db8::1]/x")
    assert(canon("https://[2001:db8::443]/x") == "https://[2001:db8::443]/x")
    assert(canon("https://[2001:db8::1]:8443/x") == "https://[2001:db8::1]:8443/x")
    // percent normalization: unreserved decodes, reserved uppercases,
    // malformed '%' kept verbatim; case preserved on decode
    assert(canon("https://example.com/%7Ea/b%2fc") == "https://example.com/~a/b%2Fc")
    assert(canon("https://example.com/x?q=%41%2a") == "https://example.com/x?q=A%2A")
    assert(canon("https://example.com/x?q=%zz%4") == "https://example.com/x?q=%zz%4")
    // an encoded '&' must NOT become a param separator
    assert(canon("https://example.com/x?a=1%262&b=2")
      == "https://example.com/x?a=1%262&b=2")
    // drop-list matches the NORMALIZED name
    assert(canon("https://example.com/x?utm%5Fsource=s&a=1")
      == "https://example.com/x?a=1")
    // path dot-segments + duplicate slashes; '..' above root drops;
    // encoded dots normalize before resolution
    assert(canon("https://example.com/a/b/../c/./d//e")
      == "https://example.com/a/c/d/e")
    assert(canon("https://example.com/../a") == "https://example.com/a")
    assert(canon("https://example.com/a/%2E%2E/b") == "https://example.com/b")
    // IDN host folds to punycode
    assert(canon("https://münchen.example/x")
      == "https://xn--mnchen-3ya.example/x")
    // parameterized drop-list: a tighter spec keeps 'ref'
    val kept = Seq(Tuple1("https://example.com/x?ref=r&utm_source=s")).toDF("u")
      .select(graft.functions.expressions
        .canonicalUrl(col("u"), "utm_*").as("c")).as[String].head()
    assert(kept == "https://example.com/x?ref=r")
  }

  test("canonicalDedup collapses surface variants onto the lowest id") {
    val rows = Seq(
      (1L, "https://site.com/p?a=1&b=2"),
      (2L, "HTTP://WWW.SITE.COM:80/p/?b=2&a=1&utm_source=x"),
      (3L, "https://site.com:443/p?a=1&b=2#sec"),
      (4L, "https://other.com/p?a=1&b=2")).toDF("id", "url")
    val got = Urls.canonicalDedup(rows, "id", "url")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    val c = "https://site.com/p?a=1&b=2"
    assert(got(1L) == (c, 1L, 3L, true))
    assert(got(2L) == (c, 1L, 3L, false))
    assert(got(3L) == (c, 1L, 3L, false))
    assert(got(4L) == ("https://other.com/p?a=1&b=2", 4L, 1L, true))
  }

  test("foldHttp parameter: the scheme fold is a knob, defaulting ON (r19)") {
    def canonFold(u: String, fold: Boolean): String =
      Seq(Tuple1(u)).toDF("u")
        .select(graft.functions.expressions
          .canonicalUrl(col("u"), graft.functions.UrlDropList.DefaultSpec, fold)
          .as("c")).as[String].head()
    // default folds; fold OFF keeps the scheme (80 vs 443 can differ)
    assert(canon("http://site.com/x") == "https://site.com/x")
    assert(canonFold("http://site.com/x", false) == "http://site.com/x")
    // every other rule still applies under fold OFF — including the
    // ORIGINAL scheme's default-port strip
    assert(canonFold("HTTP://WWW.Site.COM:80/a/?b=2&a=1&utm_source=x#f", false)
      == "http://site.com/a?a=1&b=2")
    // dedup under fold OFF keeps the pair distinct
    val rows = Seq((1L, "http://fold.com/p"), (2L, "https://fold.com/p"))
      .toDF("id", "url")
    val on = Urls.canonicalDedup(rows, "id", "url")
      .select("id", "keep").as[(Long, Boolean)].collect().toMap
    assert(on == Map(1L -> true, 2L -> false))
    val off = Urls.canonicalDedup(rows, "id", "url", foldHttp = false)
      .select("id", "keep").as[(Long, Boolean)].collect().toMap
    assert(off == Map(1L -> true, 2L -> true))
  }

  test("canonicalDedup: null URLs are singletons, never merged (ADVICE r18)") {
    val rows = Seq(
      (1L, "https://site.com/p"),
      (2L, null.asInstanceOf[String]),
      (3L, null.asInstanceOf[String]),
      (4L, "https://site.com/p")).toDF("id", "url")
    val got = Urls.canonicalDedup(rows, "id", "url")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(got(1L) == ((Some("https://site.com/p"), 1L, 2L, true)))
    assert(got(4L) == ((Some("https://site.com/p"), 1L, 2L, false)))
    // each null-URL row: its own group, kept, canon stays null
    assert(got(2L) == ((None, 2L, 1L, true)))
    assert(got(3L) == ((None, 3L, 1L, true)))
  }
}
