package graft.plugins

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Html
import graft.plugins.IndexingFilters._

/** POJO target for the reflective index-arbitrary path (the shape the
  * reference instantiates via Class.forName — a String[] constructor
  * receiving the doc url first, ArbitraryIndexingFilter.java:211-229). */
class ArbitraryPojo(args: Array[String]) {
  def urlTag(): String = "seen:" + args.mkString(",")
  def joined(xs: Array[String]): String = args(0) + "#" + xs.mkString("+")
  def giveNull(): String = null
}

/** Scalar semantics of the index-anchor / index-more / parse-metatags
  * analogs (reference expectations inline per function). */
class IndexingFiltersSpec extends AnyFunSuite {

  test("anchor dedup is case-insensitive, keeps first original case") {
    assert(dedupAnchors(Seq("Home", "home", "About", "HOME", "about us")) ==
      Seq("Home", "About", "about us"))
    assert(dedupAnchors(Nil).isEmpty)
    assert(dedupAnchors(Seq(null, "x", null)) == Seq("x"))
  }

  test("type fields: full mime + primary + sub, params stripped") {
    assert(typeFields("text/HTML; charset=utf-8") ==
      Seq("text/html", "text", "html"))
    assert(typeFields("application/vnd.ms-powerpoint") ==
      Seq("application/vnd.ms-powerpoint", "application", "vnd.ms-powerpoint"))
    assert(typeFields(null).isEmpty)
    assert(typeFields("  ").isEmpty)
  }

  test("date resolution: header beats modified beats fetch") {
    // RFC 1123 header parses
    val (lm1, d1) = docDate(Some("Sat, 06 Jan 2024 00:00:07 GMT"), 5L, 9L)
    assert(lm1.contains(1704499207000L) && d1 == 1704499207000L)
    // fallback style (DateUtils analog)
    val (lm2, d2) = docDate(Some("2024/01/06"), 5L, 9L)
    assert(lm2.contains(1704499200000L) && d2 == 1704499200000L)
    // garbage header -> modified time
    val (lm3, d3) = docDate(Some("not a date"), 5L, 9L)
    assert(lm3.isEmpty && d3 == 5L)
    // no header, no modified -> fetch time
    val (lm4, d4) = docDate(None, 0L, 9L)
    assert(lm4.isEmpty && d4 == 9L)
  }

  test("content-disposition filename: quoted wins, bare token fallback") {
    assert(dispositionFilename("inline; filename=\"foo.ppt\"")
      .contains("foo.ppt"))
    assert(dispositionFilename("attachment; filename=bar.pdf")
      .contains("bar.pdf"))
    assert(dispositionFilename("inline").isEmpty)
    assert(dispositionFilename(null).isEmpty)
  }

  test("content-length trimmed (NUTCH-1010)") {
    assert(contentLength("  1234 ").contains("1234"))
    assert(contentLength("   ").isEmpty)
    assert(contentLength(null).isEmpty)
  }

  test("meta tags: general + http-equiv, body excluded, robots flags") {
    val html = """<html><head>
      |<meta name="Keywords" content="a,b">
      |<meta http-equiv="Content-Type" content="text/html">
      |<meta name="robots" content="noindex, nofollow">
      |<meta name="nocontent">
      |</head><body><meta name="inbody" content="x"></body></html>"""
      .stripMargin
    val tags = Html.getMetaTags(Html.parse(html))
    assert(tags.general == Seq("keywords" -> "a,b",
      "robots" -> "noindex, nofollow"))
    assert(tags.httpEquiv == Seq("content-type" -> "text/html"))
    assert(tags.noIndex && tags.noFollow && !tags.noCache)
  }

  test("static/tld/urlmeta/metadata registry filters") {
    import graft.schemas.CrawlDatum
    val datum = CrawlDatum(1.toByte, 0L, 0, 0, 0f, None, 0L,
      Map("nutch.score.operator" -> "3.5", "other" -> "x"))
    val url = "https://news.example.co.uk/story"

    assert(StaticIndexingFilter.parseFields("source:web, rank:5") ==
      Map("source" -> "web", "rank" -> "5"))
    val static = new StaticIndexingFilter(Map("source" -> "web"))
    assert(static.filter(Map("url" -> url), url, datum).get("source") == "web")

    val tld = new TldIndexingFilter
    assert(tld.filter(Map.empty, url, datum).get("tld") == "co.uk")
    // no suffix (bare host): field absent, doc passes through
    assert(!(tld.filter(Map.empty, "http://localhost/x", datum).get
      .contains("tld")))

    val urlmeta = new UrlMetaIndexingFilter(Seq("nutch.score.operator", "nope"))
    val um = urlmeta.filter(Map.empty, url, datum).get
    assert(um == Map("nutch.score.operator" -> "3.5"))

    val metaf = new MetadataIndexingFilter(Seq("other"))
    assert(metaf.filter(Map.empty, url, datum).get == Map("meta_other" -> "x"))

    // chain through the registry seam
    val reg = Extensions.Registry(indexingFilters = Seq(
      new Extensions.BasicIndexingFilter, static, tld, urlmeta))
    val doc = reg.indexingFilters.foldLeft(Option(Map.empty[String, String])) {
      (d, f) => d.flatMap(f.filter(_, url, datum))
    }
    assert(doc.get.keySet == Set("url", "host", "source", "tld",
      "nutch.score.operator"))
  }

  test("index-arbitrary: function path add/append/overwrite/clear") {
    import graft.schemas.CrawlDatum
    val datum = CrawlDatum(1.toByte, 0L, 0, 0, 0f, None, 0L, Map.empty)
    val url = "http://example.com/a"

    // add to an absent field
    val f1 = new ArbitraryIndexingFilter("grade",
      (u, _) => Some("A:" + u.length))
    assert(f1.filter(Map.empty, url, datum).get ==
      Map("grade" -> ("A:" + url.length)))
    // default add semantics: existing value becomes a | multivalue
    assert(f1.filter(Map("grade" -> "old"), url, datum).get("grade") ==
      "old|A:" + url.length)
    // overwrite replaces
    val f2 = new ArbitraryIndexingFilter("grade", (_, _) => Some("new"),
      overwrite = true)
    assert(f2.filter(Map("grade" -> "old"), url, datum).get("grade") == "new")
    // None + overwrite clears the field; None + add leaves it alone
    val fNone = new ArbitraryIndexingFilter("grade", (_, _) => None,
      overwrite = true)
    assert(!fNone.filter(Map("grade" -> "old"), url, datum).get.contains("grade"))
    val fKeep = new ArbitraryIndexingFilter("grade", (_, _) => None)
    assert(fKeep.filter(Map("grade" -> "old"), url, datum).get("grade") == "old")
    // the value function can read sibling doc fields
    val f3 = new ArbitraryIndexingFilter("echo",
      (_, doc) => doc.get("title").map(_.toUpperCase))
    assert(f3.filter(Map("title" -> "hi"), url, datum).get("echo") == "HI")
  }

  test("index-arbitrary: reflective path mirrors the POJO wiring") {
    import graft.schemas.CrawlDatum
    val datum = CrawlDatum(1.toByte, 0L, 0, 0, 0f, None, 0L, Map.empty)
    val url = "http://example.com/a"
    val cls = classOf[ArbitraryPojo].getName

    // no-arg method; url is prepended to the constructor args
    val f1 = ArbitraryIndexingFilter.reflective("tag", cls,
      Seq("k1", "k2"), "urlTag")
    assert(f1.filter(Map.empty, url, datum).get("tag") ==
      s"seen:$url,k1,k2")
    // String[]-arg method
    val f2 = ArbitraryIndexingFilter.reflective("tag", cls,
      Nil, "joined", Seq("x", "y"))
    assert(f2.filter(Map.empty, url, datum).get("tag") == s"$url#x+y")
    // null return -> treated as absent
    val f3 = ArbitraryIndexingFilter.reflective("tag", cls, Nil, "giveNull")
    assert(!f3.filter(Map.empty, url, datum).get.contains("tag"))
    // reflection failure (missing class/method) skips the field
    val f4 = ArbitraryIndexingFilter.reflective("tag", "no.such.Cls", Nil, "m")
    assert(f4.filter(Map("a" -> "1"), url, datum).get == Map("a" -> "1"))
    val f5 = ArbitraryIndexingFilter.reflective("tag", cls, Nil, "nope")
    assert(f5.filter(Map.empty, url, datum).get == Map.empty)
  }

  test("metatag entries: prefix, name filter, multivalue kept") {
    val tags = Html.MetaTags(
      Seq("keywords" -> "a", "keywords" -> "b", "author" -> "x"),
      Seq("pragma" -> "no-cache"), false, false, true)
    assert(metatagEntries(tags) == Seq("metatag.keywords" -> "a",
      "metatag.keywords" -> "b", "metatag.author" -> "x",
      "metatag.pragma" -> "no-cache"))
    assert(metatagEntries(tags, Set("keywords")) ==
      Seq("metatag.keywords" -> "a", "metatag.keywords" -> "b"))
  }
}
