package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def norm(urls: String*): Seq[Option[String]] =
    urls.toSeq.toDF("u").select(Urls.normalizeUrl(col("u")))
      .as[Option[String]].collect().toSeq

  test("normalizeUrl: case, www, default ports, fragments, tracking params") {
    norm(
      "HTTPS://WWW.Example.COM:443/Path/",
      "http://example.com:80/a//",
      "https://example.com:8443/a",
      "http://user:pw@example.com/a",
      "https://example.com/p?utm_source=x&q=1&fbclid=z&ref=tw#frag",
      "https://example.com/p?gclid=1&utm_campaign=spring",
      "https://example.com",
      "not a url",
      "ftp://files.example.com/pub/") shouldBe Seq(
      Some("https://example.com/Path"), // path case PRESERVED, host lowered
      Some("http://example.com/a"),
      Some("https://example.com:8443/a"), // non-default port kept
      Some("http://example.com/a"), // userinfo dropped
      Some("https://example.com/p?q=1"), // tracking filtered, q kept
      Some("https://example.com/p"), // all params tracking → no query
      Some("https://example.com"),
      None, // schemeless → null, never a guess
      Some("ftp://files.example.com/pub")) // unknown scheme: no default port
    // null in, null out
    Seq((1L, None: Option[String])).toDF("id", "u")
      .select(Urls.normalizeUrl(col("u"))).as[Option[String]]
      .head() shouldBe None
  }

  test("urlHost and registrableDomain: PSL-lite eTLD+1") {
    val hosts = Seq(
      "https://a.news.Example.co.uk/x",
      "https://www.example.com/x",
      "https://example.org:8080/x",
      "https://localhost/x",
      "https://deep.sub.site.com.au/x")
      .toDF("u")
      .select(Urls.urlHost(col("u")).as("h"),
        Urls.registrableDomain(Urls.urlHost(col("u"))).as("d"))
      .as[(String, String)].collect().toSeq
    hosts shouldBe Seq(
      ("a.news.example.co.uk", "example.co.uk"),
      ("www.example.com", "example.com"),
      ("example.org", "example.org"),
      ("localhost", "localhost"), // single label passes through
      ("deep.sub.site.com.au", "site.com.au"))
  }
}
