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

  test("resolver check: outcome table of ResolverThread.java:112-178") {
    import spark.implicits._
    def h(host: String, dnsFailures: Long, lastCheck: Long) =
      UpdateHostDb.HostRow(host, 1, 1, 0, 0, 0, 0, dnsFailures, 0, 1.0,
        lastCheck)
    val rows = Seq(
      h("new-ok.com", 0, 0L), // new + resolves -> new_known
      h("known-ok.com", 0, 5L), // known + resolves -> existing_known
      h("redisc.com", 3, 5L), // known + resolves + failures -> reset
      h("new-bad.com", 0, 0L), // new + fails -> dnsFailures = 1, kept
      h("old-bad.com", 7, 5L), // known + fails -> failures+1, kept
      h("purge-me.com", 1, 5L) // known + fails, threshold rule purges
    ).toDS()
    val resolver = UpdateHostDb.MockResolver(
      Set("new-bad.com", "old-bad.com", "purge-me.com"))
    // threshold 3: kept when threshold < failures (the reference's
    // literal keep-condition) — old-bad reaches 8 > 3 and survives,
    // purge-me reaches 2 <= 3 and is purged
    val (out, stats) = UpdateHostDb.check(rows, resolver, now,
      purgeFailedHostsThreshold = 3)
    val m = out.collect().map(r => r.host -> r).toMap
    assert(!m.contains("purge-me.com"))
    assert(m("new-ok.com").dnsFailures == 0 &&
      m("new-ok.com").lastCheck == now)
    assert(m("redisc.com").dnsFailures == 0) // rediscovered: reset
    assert(m("new-bad.com").dnsFailures == 1)
    assert(m("old-bad.com").dnsFailures == 8)
    assert(stats.checked == 6 && stats.newKnown == 1 &&
      stats.existingKnown == 1 && stats.rediscovered == 1 &&
      stats.newUnknown == 1 && stats.existingUnknown == 1 &&
      stats.purged == 1)
    // dnsFailures > 0 survive a subsequent merge (the r6 gap: a DNS
    // failure path that can actually be exercised end-to-end)
    val merged = UpdateHostDb(
      spark.emptyDataset[CrawlRow], out, now + 1000).collect()
      .map(r => r.host -> r).toMap
    assert(merged("new-bad.com").dnsFailures == 1)
    assert(merged("old-bad.com").dnsFailures == 8)
    out.unpersist()
  }

  test("numericStats: per-host t-digest percentiles of metadata fields") {
    import spark.implicits._
    def row(u: String, md: Map[String, String]) =
      CrawlRow(u, CrawlDatum(S.DB_FETCHED, 0L, 0, 2592000, 1f, None, 0L, md))
    // a.com: _rs_ 100..1000 in steps of 100; one junk + one absent row
    val aRows = (1 to 10).map(i =>
      row(s"http://a.com/$i", Map("_rs_" -> (i * 100).toString)))
    val db = (aRows ++ Seq(
      row("http://a.com/nan", Map("_rs_" -> "junk")), // unparseable → null
      row("http://a.com/none", Map.empty),
      row("http://b.com/1", Map("_rs_" -> "50", "cl" -> "7")))).toDS()

    val out = UpdateHostDb.numericStats(db, Seq("_rs_", "cl"),
      Seq(50, 95)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val a = out(("a.com", "_rs_"))
    assert(a.getLong(2) == 10) // junk/absent rows contribute nothing
    assert(a.getDouble(3) == 100.0 && a.getDouble(4) == 1000.0)
    assert(a.getDouble(5) == 550.0)
    val p50 = a.getDouble(6)
    val p95 = a.getDouble(7)
    assert(p50 >= 400.0 && p50 <= 700.0, s"p50=$p50")
    assert(p95 >= 900.0 && p95 <= 1000.0, s"p95=$p95")
    assert(p50 <= p95)
    val b = out(("b.com", "_rs_"))
    assert(b.getLong(2) == 1 && b.getDouble(6) == 50.0)
    assert(out(("b.com", "cl")).getDouble(6) == 7.0)
    assert(!out.contains(("a.com", "cl"))) // field absent on that host
  }
}
