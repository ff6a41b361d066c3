package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** URL canonicalization rules (q115). */
class UrlFunctionsSpec extends SparkSpec {

  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u")
      .select(UrlFunctions.canonicalizeUrl($"u").as("c"))
      .as[String].collect().toSeq

  test("case, www, default port, trailing slash, fragment all normalize") {
    assert(canon(
      "HTTPS://WWW.Example.COM:443/a/b/?x=1#frag",
      "https://example.com/a/b?x=1",
      "http://www.example.com:80/a/b?x=1",
    ) == Seq(
      "https://example.com/a/b?x=1",
      "https://example.com/a/b?x=1",
      "http://example.com/a/b?x=1",
    ))
  }

  test("non-default ports are significant and kept") {
    assert(canon("https://example.com:8080/a") == Seq("https://example.com:8080/a"))
    assert(canon("http://example.com:443/a") == Seq("http://example.com:443/a"))
  }

  test("tracking params dropped, survivors sorted, bare path becomes /") {
    assert(canon(
      "https://example.com/p?utm_campaign=x&b=2&a=1&fbclid=abc&gclid=1",
      "https://example.com/p?a=1&b=2",
      "https://example.com?utm_source=feed",
      "https://example.com/",
    ) == Seq(
      "https://example.com/p?a=1&b=2",
      "https://example.com/p?a=1&b=2",
      "https://example.com/",
      "https://example.com/",
    ))
  }

  test("canonicalHost extracts the host from a canonical URL") {
    val hosts = Seq("https://example.com:8080/a?x=1", "https://sub.demo.io/")
      .toDF("u")
      .select(UrlFunctions.canonicalHost(UrlFunctions.canonicalizeUrl($"u")))
      .as[String].collect().toSeq
    assert(hosts == Seq("example.com", "sub.demo.io"))
  }

  test("hostSuffixes emits the full dot-suffix chain, longest first") {
    val got = Seq("a.b.co.uk", "example.com", "localhost")
      .toDF("h").select(UrlFunctions.hostSuffixes($"h"))
      .as[Seq[String]].collect().toSeq
    assert(got(0) == Seq("a.b.co.uk", "b.co.uk", "co.uk", "uk"))
    assert(got(1) == Seq("example.com", "com"))
    assert(got(2) == Seq("localhost"))
  }
}
