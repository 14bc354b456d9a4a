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
}
