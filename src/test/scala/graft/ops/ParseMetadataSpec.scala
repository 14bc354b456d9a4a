package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.net.RegexUrlFilter
import graft.schemas._

/** scoring-metadata (MetadataScoringFilter.java:56-125) and
  * parsefilter-debug (DebugParseFilter.java:46-54) through the real Parse
  * operator: the three configured key lists propagate datum → content →
  * parse → outlink metadata, and debugDom lands the serialized DOM in
  * parse_meta. */
class ParseMetadataSpec extends AnyFunSuite with SparkSuite {

  private val acceptAll = RegexUrlFilter.parse(Iterator("+."))
  private val U = "http://md.example.com/"

  private def fixture(cfg: Parse.Config) = {
    import spark.implicits._
    val fetch = spark.createDataset(Seq(CrawlRow(U,
      CrawlDatum(CrawlStatus.FETCH_SUCCESS, 0L, 0, 0, 2f, None, 0L,
        Map("campaign" -> "c1", "secret" -> "s0")))))
    val html =
      """<html><title>T</title><body>Body text.
        |<a href="/x">x</a> <a href="/y">y</a></body></html>""".stripMargin
    val content = spark.createDataset(Seq(ContentRow(U, U,
      html.getBytes("UTF-8"), "text/html", Map("hdr" -> "h1"))))
    Parse(fetch, content, cfg, acceptAll)
  }

  test("scoring-metadata: the three hops carry only configured keys") {
    val out = fixture(Parse.Config(scoringMetadata = Parse.ScoringMetadata(
      datumMd = Seq("campaign"), // passScoreBeforeParsing
      contentMd = Seq("campaign", "hdr", "absent"), // passScoreAfterParsing
      parseMd = Seq("campaign", "hdr")))) // distributeScoreToOutlinks

    val pm = out.parseData.collect().head.parseMeta
    assert(pm("campaign") == "c1") // datum -> content -> parse
    assert(pm("hdr") == "h1") // content -> parse
    assert(!pm.contains("secret") && !pm.contains("absent"))

    val linked = out.crawlParse.collect()
      .filter(_.datum.status == CrawlStatus.LINKED)
    assert(linked.length == 2)
    assert(linked.forall(_.datum.metadata ==
      Map("campaign" -> "c1", "hdr" -> "h1")))
  }

  test("scoring-metadata: default config propagates nothing") {
    val out = fixture(Parse.Config())
    assert(out.parseData.collect().head.parseMeta == Map("parser" -> "html"))
    val linked = out.crawlParse.collect()
      .filter(_.datum.status == CrawlStatus.LINKED)
    assert(linked.nonEmpty && linked.forall(_.datum.metadata.isEmpty))
  }

  test("parsefilter-debug: debugDom serializes the DOM into parse_meta") {
    val out = fixture(Parse.Config(debugDom = true))
    val pm = out.parseData.collect().head.parseMeta
    val dom = pm("DOM")
    // the serialized tree reflects the tokenizer's interpretation:
    // resolved structure, normalized attribute quoting, entities escaped
    assert(dom.startsWith("<html>"))
    assert(dom.contains("<title>T</title>"))
    assert(dom.contains("<a href=\"/x\">x</a>"))
    assert(dom.contains("</html>"))
    // a second parse of the rendered DOM yields the same text + outlinks
    // (serialize/re-parse fixpoint - the property a debug dump needs)
    val reparsed = Html.parse(dom)
    assert(Html.getText(reparsed) == Html.getText(Html.parse(
      new String(fixtureHtmlBytes, "UTF-8"))))
  }

  private def fixtureHtmlBytes: Array[Byte] =
    """<html><title>T</title><body>Body text.
      |<a href="/x">x</a> <a href="/y">y</a></body></html>"""
      .stripMargin.getBytes("UTF-8")

  test("image payloads parse with width/height meta (TestImageMetadata)") {
    import spark.implicits._
    // the reference's own sample: nutch_logo_tm.gif is 121x48, and its
    // test asserts exactly those strings in the parse metadata
    val gif = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "/root/reference/src/plugin/parse-tika/sample/nutch_logo_tm.gif"))
    val u = "http://img.example.com/logo.gif"
    val fetch = spark.createDataset(Seq(CrawlRow(u,
      CrawlDatum(CrawlStatus.FETCH_SUCCESS, 0L, 0, 0, 1f, None, 0L,
        Map.empty))))
    val content = spark.createDataset(Seq(ContentRow(u, u, gif,
      "image/gif", Map.empty)))
    val out = Parse(fetch, content, Parse.Config(), acceptAll)
    val pd = out.parseData.collect().head
    assert(pd.parseStatus == ParseStatusCodes.Success)
    assert(pd.parseMeta("width") == "121")
    assert(pd.parseMeta("height") == "48")
    assert(out.parseText.collect().head.text.isEmpty)
  }
}
