package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.schemas.{CrawlDatum, CrawlRow, CrawlStatus => S}

class UpdateHostDbSpec extends AnyFunSuite with SparkSuite {

  private val now = 1700000000000L

  test("per-host census merges onto the previous hostdb") {
    import spark.implicits._
    def row(u: String, st: Byte, score: Float) =
      CrawlRow(u, CrawlDatum(st, 0L, 0, 2592000, score, None, 0L, Map.empty))
    val db = Seq(
      row("http://a.com/1", S.DB_FETCHED, 1f),
      row("http://a.com/2", S.DB_UNFETCHED, 0.5f),
      row("http://a.com/3", S.DB_GONE, 0f),
      row("http://b.com/1", S.DB_FETCHED, 2f)).toDS()
    val prev = Seq(
      UpdateHostDb.HostRow("a.com", 9, 9, 9, 0, 0, 0, 2, 1, 99.0, 1L),
      UpdateHostDb.HostRow("gone-host.com", 1, 0, 0, 0, 0, 0, 5, 0, 7.0, 2L))
      .toDS()

    val out = UpdateHostDb(db, prev, now).collect()
      .map(h => h.host -> h).toMap
    val a = out("a.com")
    assert(a.fetched == 1 && a.unfetched == 1 && a.gone == 1)
    assert(a.dnsFailures == 2 && a.connectionFailures == 1) // carried
    assert(a.score == 1.5) // fresh census replaces the old score
    assert(a.lastCheck == now)
    val b = out("b.com")
    assert(b.fetched == 1 && b.dnsFailures == 0)
    val g = out("gone-host.com") // absent this round: carried forward
    assert(g.score == 7.0 && g.lastCheck == 2L && g.dnsFailures == 5)
  }
}
