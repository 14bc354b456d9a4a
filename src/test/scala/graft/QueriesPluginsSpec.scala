package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Feed, Html}
import graft.plugins.Subcollections

/** Unit + query-level checks for the batch-6 plugin analogs: the real
  * parsers on hand-written fixtures (what the oracle's closed form can't
  * show), then the queries themselves on sf0.001. */
class QueriesPluginsSpec extends AnyFunSuite with SparkSuite {

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) = Queries.byName(name).build(spark, dir)

  // ---- Feed.parseFeed ------------------------------------------------

  test("parseFeed: RSS items with CDATA, entities, author precedence") {
    val rss =
      """<?xml version="1.0"?><rss version="2.0"><channel>
        |<title>T &amp; C</title><link>http://f.example.com/</link>
        |<item><title>A &lt;1&gt;</title><link>http://f.example.com/a</link>
        |<description><![CDATA[raw <b>markup</b> kept]]></description>
        |<author>rss@example.com</author>
        |<dc:creator>creator-wins</dc:creator>
        |<pubDate>Sat, 06 Jan 2024 01:02:03 GMT</pubDate></item>
        |<item><title>NoLink dropped</title></item>
        |</channel></rss>""".stripMargin
    val items = Feed.parseFeed(rss)
    assert(items.size == 1)
    val i = items.head
    assert(i.feedTitle == "T & C")
    assert(i.feedLink == "http://f.example.com/")
    assert(i.url == "http://f.example.com/a")
    assert(i.title == "A <1>")
    assert(i.author == "creator-wins")
    assert(i.text == "A <1> raw <b>markup</b> kept")
    assert(i.publishedMs.contains(1704499200000L + 3723000L))
  }

  test("parseFeed: the reference's rsstest.rss (TestFeedParser expectations)") {
    // TestFeedParser asserts exactly two outlinks - the two item links
    val xml = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(
        "/root/reference/src/plugin/parse-tika/sample/rsstest.rss")),
      "ISO-8859-1")
    val items = Feed.parseFeed(xml)
    assert(items.map(_.url) == Seq("http://www-scf.usc.edu/~mattmann/",
      "http://www.nutch.org/"))
    assert(items.head.title == "Home Page of Chris Mattmann")
    assert(items.head.feedTitle == "TestChannel")
    assert(items(1).text.contains("that's what it is"))
  }

  test("parseFeed: Atom entries resolve rel=alternate links and W3C dates") {
    val atom =
      """<feed xmlns="http://www.w3.org/2005/Atom">
        |<title>AtomFeed</title>
        |<link rel="self" href="http://a.example.com/feed"/>
        |<link rel="alternate" href="http://a.example.com/"/>
        |<entry><title>E1</title>
        |<link rel="enclosure" href="http://a.example.com/file"/>
        |<link rel="alternate" href="http://a.example.com/e1"/>
        |<summary>sum1</summary>
        |<author><name>ada</name></author>
        |<updated>2024-01-06T01:02:03Z</updated></entry>
        |</feed>""".stripMargin
    val items = Feed.parseFeed(atom)
    assert(items.size == 1)
    val i = items.head
    assert(i.feedLink == "http://a.example.com/")
    assert(i.url == "http://a.example.com/e1")
    assert(i.author == "ada")
    assert(i.text == "E1 sum1")
    assert(i.publishedMs.contains(1704499200000L + 3723000L))
  }

  // ---- Html.getHeadings / Html.getLicense ----------------------------

  test("getHeadings: document order, nested markup flattened, empties dropped") {
    val root = Html.parse(
      "<html><body><h1>One <em>em</em></h1><h2>  a  b </h2>" +
        "<h2></h2><div><h2>nested</h2></div><h1>Two</h1></body></html>")
    assert(Html.getHeadings(root, "h1") == Seq("One em", "Two"))
    assert(Html.getHeadings(root, "h2") == Seq("a b", "nested"))
  }

  test("getLicense: rdf comment beats rel=license beats bare anchor") {
    val rdf = "<!-- <rdf:RDF xmlns:cc=\"http://web.resource.org/cc/\">" +
      "<cc:license rdf:resource=\"http://creativecommons.org/licenses/by/2.0/\"/>" +
      "</rdf:RDF> -->"
    val rel = "<a rel=\"license\" href=\"http://creativecommons.org/licenses/by-sa/2.0/\">l</a>"
    val bare = "<a href=\"http://creativecommons.org/licenses/by-nc/2.0/\">c</a>"
    def lic(h: String) = Html.getLicense(Html.parse(h))
    assert(lic(s"<html><head>$rdf</head><body>$rel$bare</body></html>")
      .contains(("http://creativecommons.org/licenses/by/2.0/", "rdf")))
    assert(lic(s"<html><body>$bare$rel</body></html>")
      .contains(("http://creativecommons.org/licenses/by-sa/2.0/", "rel")))
    assert(lic(s"<html><body>$bare</body></html>")
      .contains(("http://creativecommons.org/licenses/by-nc/2.0/", "a")))
    assert(lic("<html><body><a href=\"http://x.example.com/\">x</a></body></html>").isEmpty)
  }

  // ---- Subcollections ------------------------------------------------

  test("subcollection XML parse + blacklist-first matching") {
    val colls = Subcollections.parse(
      """<subcollections><subcollection>
        |<id>news</id><name>News</name>
        |<whitelist>/news/
        |breaking.</whitelist>
        |<blacklist>/news/archive</blacklist>
        |</subcollection></subcollections>""".stripMargin)
    assert(colls.size == 1)
    val c = colls.head
    assert(c.matches("http://h.example.com/news/today"))
    assert(!c.matches("http://h.example.com/news/archive/old"))
    assert(c.matches("http://breaking.example.com/x"))
    assert(!c.matches("http://h.example.com/sports/"))
  }

  // ---- the four queries end-to-end on sf0.001 ------------------------

  test("feed_parse emits two linked items per document") {
    val rows = run("feed_parse").collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.length == 2 * docs)
    val withDate = rows.filter(!_.isNullAt(rows.head.fieldIndex("published_ms")))
    assert(withDate.length == docs)
  }

  test("subcollection_tag: every collection fires somewhere, archive never tags news") {
    val rows = run("subcollection_tag").collect()
    val tags = rows.map(_.getAs[String]("collections"))
    assert(tags.exists(_.contains("news")))
    assert(tags.exists(_.contains("docs")))
    assert(tags.exists(_.contains("shop")))
    rows.filter(_.getAs[String]("url").contains("/news/archive/"))
      .foreach(r => assert(!r.getAs[String]("collections").contains("news"), r))
    // mixed-case /Cart/ matches the case-insensitive shop collection
    rows.filter(_.getAs[String]("url").contains("/Cart/"))
      .foreach(r => assert(r.getAs[String]("collections").contains("shop"), r))
  }

  test("headings_extract matches the closed form") {
    val rows = run("headings_extract").collect()
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[String]("h1") == s"Main & $id", r)
      assert(r.getAs[Long]("n_h1") == (if (id % 4 == 0) 2L else 1L), r)
      assert(r.getAs[String]("h2_all") == s"First $id|Second $id", r)
    }
  }

  test("cc_license tier order over the synthesized corpus") {
    val rows = run("cc_license").collect()
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val expected = (id % 3) match {
        case 0 => ("http://creativecommons.org/licenses/by/4.0/", "rdf")
        case 1 => ("http://creativecommons.org/licenses/by-sa/4.0/", "rel")
        case _ => ("http://creativecommons.org/licenses/by-nc/4.0/", "a")
      }
      assert(r.getAs[String]("license_url") == expected._1, r)
      assert(r.getAs[String]("license_loc") == expected._2, r)
    }
  }
}
