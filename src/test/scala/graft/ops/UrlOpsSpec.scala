package graft.ops

import graft.pipe.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UrlOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def norm(url: String): (String, String) = {
    import spark.implicits._
    val r = Seq(url).toDF("u")
      .select(UrlOps.host($"u"), UrlOps.normalize($"u")).head
    (r.getString(0), r.getString(1))
  }

  test("URL-1: fragment, case, default ports, tracking params") {
    assert(norm("HTTP://EXAMPLE.com:80/Path/9?utm_source=f&id=9#frag") ==
      (("example.com", "http://example.com/Path/9?id=9")))
    assert(norm("https://Sub.Example.COM:443/a/b?gclid=xyz") ==
      (("sub.example.com", "https://sub.example.com/a/b")))
    assert(norm("http://example.org:8080/x?id=1&utm_campaign=c&q=t") ==
      (("example.org", "http://example.org:8080/x?id=1&q=t")))
    assert(norm("HTTPS://CDN.example.net/asset/3") ==
      (("cdn.example.net", "https://cdn.example.net/asset/3")))
    assert(norm("http://example.com/?fbclid=1&keep=2#x") ==
      (("example.com", "http://example.com/?keep=2")))
  }

  test("URL-1 edges: emptied query drops '?'; https default port kept " +
    "for http (and vice versa); path case preserved; no-path URLs") {
    assert(norm("http://A.B/?utm_x=1") == (("a.b", "http://a.b/")))
    // 443 is NOT http's default; 80 is NOT https's
    assert(norm("http://h:443/p") == (("h", "http://h:443/p")))
    assert(norm("https://h:80/p") == (("h", "https://h:80/p")))
    assert(norm("http://HOST.tld") == (("host.tld", "http://host.tld")))
    assert(norm("https://h/UPPER/Case?Q=V") ==
      (("h", "https://h/UPPER/Case?Q=V")))
  }

  test("url-level dedup composition: normalized duplicates collapse " +
    "where raw strings differ") {
    import spark.implicits._
    val urls = Seq(
      "http://Example.com:80/a?utm_s=1",
      "HTTP://example.COM/a",
      "http://example.com/b").toDF("u")
    val n = urls.select(UrlOps.normalize($"u").as("n"))
      .groupBy($"n").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(n == Map("http://example.com/a" -> 2L,
      "http://example.com/b" -> 1L))
  }
}
