package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.net.Pacer
import graft.schemas.{CrawlDatum, CrawlStatus => S, GenerateEntry}

/** The Fetch operator under an injected VirtualClock: pacing and the
  * time-limit drain run deterministically, with zero real sleeps. */
class FetchPacingSpec extends AnyFunSuite with SparkSuite {

  private val t0 = 1700000000000L
  private val host = "http://paced.example.com"

  private def fl = {
    import spark.implicits._
    (1 to 5).map { i =>
      GenerateEntry(1, i.toFloat, s"$host/p$i",
        CrawlDatum(S.DB_UNFETCHED, t0, 0, 2592000, i.toFloat, None, 0L,
          Map.empty))
    }.toDS()
  }

  private val proto = Fetch.MockProtocol(
    (1 to 5).map(i => s"$host/p$i" ->
      ((Fetch.Code.Success, s"<html><body>p$i</body></html>", "text/html")))
      .toMap)

  test("time limit drains the tail of a slow host as FETCH_RETRY") {
    val Fetch.Result(fetch, _, _) = Fetch(fl, proto, t0,
      pacer = Pacer.Config(serverDelayMs = 100, timeLimitMs = 250),
      clockFactory = () => new Pacer.VirtualClock(0L))
    val rows = fetch.collect().map(r => r.url -> r.datum).toMap
    val ok = rows.values.count(_.status == S.FETCH_SUCCESS)
    val drained = rows.values.filter(_.status == S.FETCH_RETRY)
    assert(ok == 3, rows) // t=0,100,200 fetched; 300 ≥ deadline
    assert(drained.size == 2)
    assert(drained.forall(_.metadata.get("_drain_").contains("timelimit")))
  }

  test("zero-delay pacing fetches everything") {
    val Fetch.Result(fetch, content, _) = Fetch(fl, proto, t0,
      pacer = Pacer.Config(serverDelayMs = 0))
    assert(fetch.collect().forall(_.datum.status == S.FETCH_SUCCESS))
    assert(content.count() == 5)
  }

  test("storeResponseTime records _rs_ and feeds fetch_latency metrics") {
    // default OFF: no _rs_ (determinism — byte-identical A/B specs)
    val Fetch.Result(f0, _, r0) = Fetch(fl, proto, t0,
      pacer = Pacer.Config(serverDelayMs = 0))
    assert(f0.collect().forall(
      !_.datum.metadata.contains(Fetch.ResponseTimeKey)))
    r0()

    val Fetch.Result(f1, _, r1) = Fetch(fl, proto, t0,
      pacer = Pacer.Config(serverDelayMs = 0), storeResponseTime = true)
    val rows = f1.collect()
    assert(rows.forall(r =>
      r.datum.metadata.get(Fetch.ResponseTimeKey).exists(v =>
        v.toLong >= 0L)), rows.map(_.datum.metadata).toSeq)

    // the LatencyTracker-analog gauges aggregate the recorded values
    import spark.implicits._
    val m = Metrics.fetcher(1, f1,
        spark.emptyDataset[graft.schemas.ContentRow]).collect()
      .map(r => r.getString(2) -> r.getLong(3)).toMap
    assert(m("fetch_latency_count_total") == 5)
    assert(m("fetch_latency_sum_ms") >= 0)
    assert(m("fetch_latency_p50_ms") <= m("fetch_latency_p99_ms"))
    r1()
  }
}
