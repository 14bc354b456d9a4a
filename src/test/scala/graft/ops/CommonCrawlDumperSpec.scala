package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.schemas.{ContentRow, CrawlDatum, CrawlRow, CrawlStatus => S}

/** S10 full records (AbstractCommonCrawlFormat field layout + reversed
  * keys). */
class CommonCrawlDumperSpec extends AnyFunSuite with SparkSuite {

  test("url key reversal (TableUtil shape)") {
    assert(CommonCrawlDumper.reverseUrlKey("http://www.example.com/p?q=1")
      == "com.example.www:http/p?q=1")
    assert(CommonCrawlDumper.reverseUrlKey("https://example.co.uk:8080/")
      == "uk.co.example:8080:https/")
    assert(CommonCrawlDumper.reverseUrlKey("http://host/")
      == "host:http/")
    assert(CommonCrawlDumper.reverseUrlKey("not a url") == "not a url")
  }

  test("full record envelope with base64 body") {
    import spark.implicits._
    val url = "http://www.cc.example.com/page"
    val body = "<html><body>cc dump</body></html>"
    val fetch = Seq(
      CrawlRow(url, CrawlDatum(S.FETCH_SUCCESS, 1700000000000L, 0, 0, 1f,
        None, 0L, Map.empty)),
      CrawlRow("http://www.cc.example.com/missed", CrawlDatum(S.FETCH_GONE,
        0L, 0, 0, 1f, None, 0L, Map.empty))).toDS()
    val content = Seq(
      ContentRow(url, url, body.getBytes("UTF-8"), "text/html", Map.empty))
      .toDS()
    val recs = CommonCrawlDumper.records(fetch, content).collect()
    assert(recs.length == 1) // only the success
    val r = recs.head
    assert(r.contains("\"url\":\"" + url + "\""))
    assert(r.contains("\"timestamp\":1700000000000"))
    assert(r.contains("\"key\":\"com.example.cc.www:http/page\""))
    assert(r.contains("\"method\":\"GET\""))
    assert(r.contains("\"status\":200"))
    assert(r.contains("\"Content-Type\":\"text/html\""))
    val b64 = java.util.Base64.getEncoder.encodeToString(
      body.getBytes("UTF-8"))
    assert(r.contains("\"body\":\"" + b64 + "\""))
    // record parses as one JSON object via Spark's own reader
    val parsed = spark.read.json(Seq(r).toDS())
    assert(parsed.select("response.server.hostname").head().getString(0)
      == "www.cc.example.com")
  }
}
