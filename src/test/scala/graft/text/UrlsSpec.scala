package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def norm(u: String): (String, String, String) = {
    val r = Seq(u).toDF("u").select(
      Urls.normalizeUrl(col("u")), Urls.urlHost(col("u")), Urls.urlDomain(col("u")))
      .collect()(0)
    (r.getString(0), r.getString(1), r.getString(2))
  }

  test("normalization: case, default ports, fragments, dup slashes, trailing slash") {
    assert(norm("HTTP://WWW.EXAMPLE.COM:80//a//b?x=1#f") ==
      (("http://www.example.com/a/b?x=1", "www.example.com", "example.com")))
    // path case is significant and preserved; query kept verbatim
    assert(norm("https://Host.Org:443/Path/File.HTML?Q=Mixed")._1 ==
      "https://host.org/Path/File.HTML?Q=Mixed")
    // non-default port survives; non-http scheme keeps :80
    assert(norm("http://h.net:8080/x")._1 == "http://h.net:8080/x")
    assert(norm("ftp://H.IO:80/data")._1 == "ftp://h.io:80/data")
    // bare host: trailing slash strips; deeper trailing slashes stay
    assert(norm("https://a.b.c.com/")._1 == "https://a.b.c.com")
    assert(norm("https://a.b.c.com/x/")._1 == "https://a.b.c.com/x/")
    // bare trailing "?" strips; "?" with content stays
    assert(norm("http://h.com/p?")._1 == "http://h.com/p")
    // the //+ collapse is a PATH rule: query bytes stay verbatim even
    // when they embed '://' or '//' (a redirect param is identity)
    assert(norm("http://h.com/p//q?next=https://x//y")._1 ==
      "http://h.com/p/q?next=https://x//y")
    assert(norm("http://h.com/p?a=1&b=//raw")._1 == "http://h.com/p?a=1&b=//raw")
    // a bare '?' strip applies only to an EMPTY query
    assert(norm("http://h.com/p?x")._1 == "http://h.com/p?x")
    // multi-label host -> last two labels as the domain
    assert(norm("https://a.b.c.com/")._3 == "c.com")
    // single-label host is its own domain
    assert(norm("http://localhost:8080/")._2 == "localhost")
    assert(norm("http://localhost:8080/")._3 == "localhost")
  }

  test("degenerate inputs: no scheme, empty, fragment-only — sane, not crashed") {
    assert(norm("not a url")._2 == "")
    // no scheme://authority prefix -> byte-identical pass-through
    // (guessing would corrupt: '//host/path' is NOT '/host/path')
    assert(norm("not a url")._1 == "not a url")
    assert(norm("//cdn.net//x#f")._1 == "//cdn.net//x#f")
    assert(norm("www.example.com/a//b?x#f")._1 == "www.example.com/a//b?x#f")
    assert(norm("")._1 == "" && norm("")._2 == "")
    assert(norm("https://h.com#only-fragment")._1 == "https://h.com")
    val n = Seq((1L, null: String)).toDF("id", "u")
      .select(Urls.normalizeUrl(col("u"))).collect()(0)
    assert(n.isNullAt(0))
  }
}
