package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.net.RegexUrlFilter
import graft.plugins.RegexExemptionFilter
import graft.schemas._

/** db.ignore.external.links + the urlfilter-ignoreexempt seam
  * (ParseOutputFormat.filterNormalize exemption check,
  * ExemptionUrlFilter.java:54-70): external outlinks drop when the
  * knob is on, unless an exemption rule accepts them. */
class ParseExternalSpec extends AnyFunSuite with SparkSuite {

  private val A = "http://site-a.example.com"
  private def fixtures = {
    import spark.implicits._
    val html = s"""<html><body>
      <a href="$A/internal">in</a>
      <a href="http://other.example.org/page">ext</a>
      <a href="http://allowed.example.net/cdn">cdn</a>
      </body></html>"""
    val fetch = Seq(CrawlRow(s"$A/", CrawlDatum(
      CrawlStatus.FETCH_SUCCESS, 1L, 0, 2592000, 1f, None, 0L,
      Map.empty))).toDS()
    val content = Seq(ContentRow(s"$A/", s"$A/",
      html.getBytes("UTF-8"), "text/html", Map.empty)).toDS()
    (fetch, content)
  }
  private val acceptAll = RegexUrlFilter.parse(Iterator("+."))

  private def outlinkSet(p: Parse.ParseOutput): Set[String] =
    p.parseData.collect().flatMap(_.outlinks.map(_.toUrl)).toSet

  test("default: external outlinks are kept") {
    val (fetch, content) = fixtures
    val links = outlinkSet(Parse(fetch, content, Parse.Config(), acceptAll))
    assert(links.contains("http://other.example.org/page"))
    assert(links.contains(s"$A/internal"))
  }

  test("ignoreExternalLinks drops cross-host outlinks") {
    val (fetch, content) = fixtures
    val links = outlinkSet(Parse(fetch, content,
      Parse.Config(ignoreExternalLinks = true), acceptAll))
    assert(links == Set(s"$A/internal"))
  }

  test("an exemption rule keeps a matching external outlink") {
    val (fetch, content) = fixtures
    val links = outlinkSet(Parse(fetch, content,
      Parse.Config(ignoreExternalLinks = true), acceptAll,
      exemption = new RegexExemptionFilter(
        Iterator("+^http://allowed\\.example\\.net/"))))
    assert(links == Set(s"$A/internal", "http://allowed.example.net/cdn"))
  }
}
