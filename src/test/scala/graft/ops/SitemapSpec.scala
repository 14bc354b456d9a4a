package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.schemas.{CrawlDatum, CrawlRow, CrawlStatus => S}

/** S13 full path: robots-declared sitemaps + default /sitemap.xml,
  * sitemap-index recursion, priority/changefreq/lastmod mapping, and the
  * crawldb merge (SitemapProcessor.java:92-440). */
class SitemapSpec extends AnyFunSuite with SparkSuite {

  private val t0 = 1700000000000L
  private val A = "a.example.com"
  private val B = "b.example.com"

  private val site = Fetch.MockProtocol(Map(
    // host A declares its sitemap in robots.txt; it is an INDEX
    s"http://$A/robots.txt" -> ((Fetch.Code.Success,
      s"User-agent: *\nDisallow:\nSitemap: http://$A/smidx.xml", "text/plain")),
    s"http://$A/smidx.xml" -> ((Fetch.Code.Success,
      s"""<sitemapindex>
         |<sitemap><loc>http://$A/sm1.xml</loc></sitemap>
         |<sitemap><loc>http://$A/sm2.xml</loc></sitemap>
         |</sitemapindex>""".stripMargin, "application/xml")),
    s"http://$A/sm1.xml" -> ((Fetch.Code.Success,
      s"""<urlset>
         |<url><loc>http://$A/p1</loc><priority>0.9</priority>
         |  <changefreq>daily</changefreq>
         |  <lastmod>2023-11-01</lastmod></url>
         |<url><loc>http://$A/p2</loc><priority>0</priority></url>
         |</urlset>""".stripMargin, "application/xml")),
    s"http://$A/sm2.xml" -> ((Fetch.Code.Success,
      s"""<urlset>
         |<url><loc>http://$A/p3</loc><changefreq>never</changefreq></url>
         |<url><loc>/relative-rejected</loc></url>
         |</urlset>""".stripMargin, "application/xml")),
    // host B has no robots sitemap → default /sitemap.xml
    s"http://$B/robots.txt" -> ((Fetch.Code.Gone, "", "")),
    s"http://$B/sitemap.xml" -> ((Fetch.Code.Success,
      s"""<urlset><url><loc>http://$B/only</loc>
         |<lastmod>2999-01-01</lastmod></url></urlset>""".stripMargin,
      "application/xml"))))

  private def run(cfg: Sitemap.Config = Sitemap.Config()) = {
    import spark.implicits._
    Sitemap.discover(Seq(A, B).toDS(), site, t0, "graft", cfg)
      .collect().map(r => r.url -> r.datum).toMap
  }

  test("discovery: robots directive, index recursion, default sitemap.xml") {
    val found = run()
    assert(found.keySet == Set(s"http://$A/p1", s"http://$A/p2",
      s"http://$A/p3", s"http://$B/only"))
  }

  test("priority/changefreq/lastmod map onto score/interval/modifiedTime") {
    val found = run()
    val p1 = found(s"http://$A/p1")
    assert(p1.score == 0.9f)
    assert(p1.fetchInterval == 86400) // daily
    assert(p1.modifiedTime ==
      java.time.LocalDate.parse("2023-11-01")
        .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli)
    // priority 0 → default 0.5 (score 0 would mean never fetch)
    assert(found(s"http://$A/p2").score == 0.5f)
    // "never" clamps to maxInterval
    assert(found(s"http://$A/p3").fetchInterval == 31536000)
    // future lastmod is ignored
    assert(found(s"http://$B/only").modifiedTime == 0L)
  }

  test("merge: existing wins, overwrite copies schedule, new = unfetched") {
    import spark.implicits._
    val sm = Sitemap.discover(Seq(A).toDS(), site, t0, "graft",
      Sitemap.Config())
    val db = Seq(CrawlRow(s"http://$A/p1",
      CrawlDatum(S.DB_FETCHED, t0, 0, 2592000, 2.5f, Some("sig"), 7L,
        Map.empty))).toDS()

    val kept = Sitemap.merge(db, sm, Sitemap.Config())
      .collect().map(r => r.url -> r.datum).toMap
    assert(kept(s"http://$A/p1").score == 2.5f) // original untouched
    assert(kept(s"http://$A/p1").status == S.DB_FETCHED)
    assert(kept(s"http://$A/p2").status == S.DB_UNFETCHED) // new entry
    assert(kept(s"http://$A/p2").score == 0.5f)

    val over = Sitemap.merge(db, sm,
      Sitemap.Config(overwriteExisting = true))
      .collect().map(r => r.url -> r.datum).toMap
    val p1 = over(s"http://$A/p1")
    assert(p1.status == S.DB_FETCHED) // status survives
    assert(p1.score == 0.9f && p1.fetchInterval == 86400) // schedule copied
    assert(p1.signature.contains("sig"))
  }
}
