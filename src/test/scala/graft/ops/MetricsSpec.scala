package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.schemas._

/** Metrics unit coverage: the ErrorTracker categorize ladder
  * (reference metrics/ErrorTracker.java:285-340) and the fetcher
  * error/robots counter derivation from planted fetch rows. */
class MetricsSpec extends AnyFunSuite with SparkSuite {

  import Metrics.Errors.categorize

  test("error categorize ladder matches the reference's precedence") {
    // timeout BEFORE the general IOException catch-all
    assert(categorize(new java.net.SocketTimeoutException("t")) == "timeout")
    assert(categorize(new java.util.concurrent.TimeoutException()) == "timeout")
    // specific network types
    assert(categorize(new java.net.ConnectException("refused")) == "network")
    assert(categorize(new java.net.UnknownHostException("x")) == "network")
    // URL errors BEFORE IOException (MalformedURLException extends it)
    assert(categorize(new java.net.MalformedURLException("m")) == "url")
    assert(categorize(new IllegalArgumentException("bad uri")) == "url")
    // remaining IO is network
    assert(categorize(new java.io.IOException("io")) == "network")
    assert(categorize(new java.net.ProtocolException("p")) == "network",
      "ProtocolException extends IOException: IO wins, like the reference")
    assert(categorize(new java.text.ParseException("p", 0)) == "parsing")
    assert(categorize(new RuntimeException("?")) == "other")
    assert(categorize(null) == "other")
  }

  test("fetcher counters derive errors and robots splits from metadata") {
    import spark.implicits._
    def row(url: String, status: Byte, md: Map[String, String]) =
      CrawlRow(url, CrawlDatum(status, 0L, 0, 30, 0f, None, 0L, md))
    val fetch = Seq(
      row("http://a/1", CrawlStatus.FETCH_SUCCESS, Map.empty),
      row("http://a/2", CrawlStatus.FETCH_RETRY,
        Map(Metrics.Errors.MetadataKey -> "network")),
      row("http://a/3", CrawlStatus.FETCH_RETRY,
        Map(Metrics.Errors.MetadataKey -> "timeout")),
      row("http://a/4", CrawlStatus.FETCH_GONE,
        Map(Fetch.RobotsDeniedKey -> "true")),
      row("http://a/5", CrawlStatus.FETCH_GONE,
        Map(Fetch.RobotsDeniedKey -> "crawl-delay")),
      row("http://a/6", CrawlStatus.FETCH_GONE, Map.empty)).toDS()
    val m = Metrics.fetcher(1, fetch, spark.emptyDataset[ContentRow])
      .collect().map(r => r.getString(2) -> r.getLong(3)).toMap
    assert(m("fetched_total") == 1)
    assert(m("errors_total") == 2)
    assert(m("errors_network_total") == 1)
    assert(m("errors_timeout_total") == 1)
    assert(m("errors_url_total") == 0)
    assert(m("robots_denied_total") == 1)
    assert(m("robots_denied_maxcrawldelay_total") == 1)
    // plain GONE (a 404) is a failed fetch; robots-denied GONE is not
    assert(m("failed_fetches_total") == 1)
  }

  test("HttpProtocol records the error category on a dead port") {
    val proto = new graft.net.HttpProtocol()
    val out = proto.fetch("http://127.0.0.1:1/x",
      CrawlDatum.unfetched(0L, 30))
    assert(out.code == Fetch.Code.Retry)
    assert(out.errorCategory.contains("network"), out.errorCategory)
  }
}
