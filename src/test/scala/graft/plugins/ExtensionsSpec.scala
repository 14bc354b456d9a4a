package graft.plugins

import org.scalatest.funsuite.AnyFunSuite

import graft.net.RegexUrlFilter
import graft.schemas.{CrawlDatum, CrawlStatus}

class ExtensionsSpec extends AnyFunSuite {

  test("registry assembles normalize→filter chains") {
    val reg = Extensions.Registry(
      urlFilters = Seq(RegexUrlFilter.parse(Iterator("-\\.gif$", "+."))))
    assert(reg.normalizeAndFilter("HTTP://A.com:80/x.html", "default")
      .contains("http://a.com/x.html"))
    assert(reg.normalizeAndFilter("http://a.com/x.gif", "default").isEmpty)
    assert(reg.normalizeAndFilter("not-a-url", "default").isEmpty)
  }

  test("parser seam delegates to the html parser") {
    val p = new Extensions.HtmlTokenizerParser()
    val (st, title, text, links) = p.parse("http://a.com/", "http://a.com/",
      "<html><title>T</title><a href=\"/b\">B</a></html>".getBytes("UTF-8"),
      "text/html")
    assert(st == graft.schemas.ParseStatusCodes.Success)
    assert(title == "T")
    assert(text.contains("B"))
    assert(links.map(_.toUrl) == Seq("http://a.com/b"))
  }

  test("scoped normalizer chains override per scope, fall back to default") {
    import Extensions.Scope
    // an outlink-scope-only normalizer that strips query strings
    val stripQuery = new Extensions.UrlNormalizer {
      def normalize(url: String, scope: String): Option[String] =
        Some(url.takeWhile(_ != '?'))
    }
    val reg = Extensions.Registry(
      scopedNormalizers = Map(Scope.Outlink ->
        Seq(stripQuery, new Extensions.BasicUrlNormalizer)))
    // outlink scope: query stripped, then basic-normalized
    assert(reg.normalize("HTTP://A.com/p?q=1", Scope.Outlink)
      .contains("http://a.com/p"))
    // every other scope falls back to the default chain (query kept)
    for (s <- Scope.All if s != Scope.Outlink)
      assert(reg.normalize("HTTP://A.com/p?q=1", s)
        .contains("http://a.com/p?q=1"), s)
    assert(Scope.All.size == 9) // the reference's nine scopes
  }

  test("basic indexing filter contributes url + host fields") {
    val f = new Extensions.BasicIndexingFilter
    val datum = CrawlDatum(CrawlStatus.DB_FETCHED, 0L, 0, 0, 1f, None, 0L,
      Map.empty)
    val doc = f.filter(Map("title" -> "t"), "http://www.a.com/x", datum)
    assert(doc.contains(Map("title" -> "t", "url" -> "http://www.a.com/x",
      "host" -> "www.a.com")))
  }
}
