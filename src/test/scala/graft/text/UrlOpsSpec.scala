package graft.text

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class UrlOpsSpec extends SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("u").select(UrlOps.canonicalizeUrl(col("u"))).as[String]
      .collect().toSeq
  }

  test("canonicalization: case, www, default ports, fragments, tracking, slashes") {
    assert(canon("HTTPS://WWW.Example.COM:443/A/b/") === Seq("https://example.com/A/b"))
    assert(canon("http://example.com:80/") === Seq("http://example.com/"))
    assert(canon("https://example.com/p?utm_source=x&utm_medium=y&q=1#frag")
      === Seq("https://example.com/p?q=1"))
    assert(canon("https://example.com/p?ref=abc") === Seq("https://example.com/p"))
    // path case preserved; non-default port preserved; non-www label kept
    assert(canon("https://cdn.Example.com:8443/Path/File")
      === Seq("https://cdn.example.com:8443/Path/File"))
    // trailing slash kept when a query survives
    assert(canon("https://example.com/a/?q=1") === Seq("https://example.com/a/?q=1"))
    // root slash is never stripped
    assert(canon("https://example.com/") === Seq("https://example.com/"))
  }

  test("idempotence: canonicalizing a canonical URL is a no-op") {
    val messy = Seq(
      "HTTPS://WWW.Example.COM:443/A/b/?utm_source=x&q=1#f",
      "http://sub.host.org:80/x/",
      "https://example.com/p?ref=abc&keep=2")
    val once = canon(messy: _*)
    assert(canon(once: _*) === once)
  }

  test("tracking-param removal is anchored to a parameter boundary") {
    // params whose NAMES merely end in "ref" must survive intact
    assert(canon("https://example.com/p?pref=1") === Seq("https://example.com/p?pref=1"))
    assert(canon("https://example.com/p?href=x&q=2")
      === Seq("https://example.com/p?href=x&q=2"))
    assert(canon("https://example.com/p?a=1&xref=b")
      === Seq("https://example.com/p?a=1&xref=b"))
    // consecutive tracking params all removed in one pass
    assert(canon("https://example.com/p?ref=1&utm_a=2&utm_b=3")
      === Seq("https://example.com/p"))
    assert(canon("https://example.com/p?ref=1&utm_a=2&keep=3")
      === Seq("https://example.com/p?keep=3"))
    // tracking param mid-query leaves no double separator
    assert(canon("https://example.com/p?utm_a=1&x=2") === Seq("https://example.com/p?x=2"))
  }

  test("registrable domain honors the embedded public-suffix subset") {
    import spark.implicits._
    val got = Seq(
      "https://news.bbc.co.uk/x",
      "https://a.b.shop.com.br/",
      "https://example.com/x",
      "https://notco.uk/x", // single-label registration directly under .uk
      "https://co.uk/x")    // bare public suffix: falls back to two labels
      .toDF("u").select(UrlOps.registrableDomain(col("u"))).as[String]
      .collect().toSeq
    assert(got === Seq("bbc.co.uk", "shop.com.br", "example.com", "notco.uk", "co.uk"))
  }

  test("domain and registrable-domain extraction") {
    import spark.implicits._
    val got = Seq("https://a.b.example.com/x?q=1", "https://example.com:8443/")
      .toDF("u")
      .select(
        UrlOps.domain(col("u")).as("d"),
        UrlOps.registrableDomain(col("u")).as("rd"))
      .as[(String, String)].collect().toSeq
    assert(got === Seq(("a.b.example.com", "example.com"), ("example.com", "example.com")))
  }
}
