package graft.crawl

import org.scalatest.funsuite.AnyFunSuite

import graft.schemas.{CrawlDatum, CrawlStatus => S}

/** Unit tests for the fetch schedules (reference:
  * AbstractFetchSchedule.java:67-230, DefaultFetchSchedule.java:30-48,
  * AdaptiveFetchSchedule.java:100-270 and its main() self-check).
  */
class FetchScheduleSpec extends AnyFunSuite {

  private val now = 1700000000000L
  private val cfg = ScheduleConfig()

  private def fresh(sched: FetchSchedule): CrawlDatum =
    sched.initializeSchedule(
      CrawlDatum(S.DB_UNFETCHED, 0L, 0, 0, 1.0f, None, 0L, Map.empty), now)

  test("initializeSchedule sets default interval, now, zero retries") {
    val d = fresh(DefaultFetchSchedule(cfg))
    assert(d.fetchInterval == cfg.defaultInterval)
    assert(d.fetchTime == now)
    assert(d.retries == 0)
  }

  test("default schedule: next fetch = fetchTime + interval") {
    val sched = DefaultFetchSchedule(cfg)
    val d = sched.setFetchSchedule("u", fresh(sched), 0L, 0L, now, 0L,
      FetchSchedule.STATUS_UNKNOWN)
    assert(d.fetchTime == now + cfg.defaultInterval.toLong * 1000)
    assert(d.modifiedTime == now) // unset modifiedTime -> fetch time
  }

  test("adaptive: interval shrinks on modified, grows on notmodified, clamped") {
    val sched = AdaptiveFetchSchedule(cfg.copy(syncDelta = false))
    val base = fresh(sched)
    val dMod = sched.setFetchSchedule("u", base, 0L, 0L, now, now,
      FetchSchedule.STATUS_MODIFIED)
    assert(dMod.fetchInterval ==
      math.round(cfg.defaultInterval * (1.0f - cfg.decRate)))
    val dNot = sched.setFetchSchedule("u", base, 0L, 0L, now, now,
      FetchSchedule.STATUS_NOTMODIFIED)
    assert(dNot.fetchInterval ==
      math.round(cfg.defaultInterval * (1.0f + cfg.incRate)))
    // repeated notmodified converges to the max, never beyond
    var d = base
    for (_ <- 1 to 60)
      d = sched.setFetchSchedule("u", d, 0L, 0L, d.fetchTime, d.fetchTime,
        FetchSchedule.STATUS_NOTMODIFIED)
    assert(d.fetchInterval == math.round(cfg.adaptiveMaxInterval))
    // repeated modified converges to the min, never below
    d = base
    for (_ <- 1 to 200)
      d = sched.setFetchSchedule("u", d, 0L, 0L, d.fetchTime, d.fetchTime,
        FetchSchedule.STATUS_MODIFIED)
    assert(d.fetchInterval == math.round(cfg.adaptiveMinInterval))
  }

  test("adaptive: fixedInterval metadata overrides adaptation") {
    val sched = AdaptiveFetchSchedule(cfg)
    val d0 = fresh(sched).copy(
      metadata = Map(CrawlDatum.FixedIntervalKey -> "3600"))
    val d = sched.setFetchSchedule("u", d0, 0L, 0L, now, now,
      FetchSchedule.STATUS_NOTMODIFIED)
    assert(d.fetchInterval == 3600)
    assert(d.fetchTime == now + 3600L * 1000)
  }

  test("setPageGoneSchedule: +50% growth capped at 0.9*max") {
    val sched = DefaultFetchSchedule(cfg)
    var d = fresh(sched)
    val expected1 = math.round(cfg.defaultInterval * 1.5f)
    d = sched.setPageGoneSchedule(d, now)
    assert(d.fetchInterval == expected1)
    for (_ <- 1 to 10) d = sched.setPageGoneSchedule(d, now)
    assert(d.fetchInterval == math.round(cfg.maxInterval * 0.9f))
  }

  test("setPageRetrySchedule: +1 retry, next try in one day") {
    val sched = DefaultFetchSchedule(cfg)
    val d = sched.setPageRetrySchedule(fresh(sched), now)
    assert(d.retries == 1)
    assert(d.fetchTime == now + FetchSchedule.SecondsPerDay * 1000)
  }

  test("shouldFetch: due now, not before; too-remote fetchTime is pulled in") {
    val sched = DefaultFetchSchedule(cfg)
    val d = fresh(sched)
    assert(sched.shouldFetch(d, now)._1) // due exactly now
    assert(!sched.shouldFetch(d, now - 1000)._1)
    // fetchTime more than maxInterval in the future: pulled back to curTime
    val remote = d.copy(fetchTime = now + (cfg.maxInterval.toLong + 10) * 1000)
    val (due, adj) = sched.shouldFetch(remote, now)
    assert(due)
    assert(adj.fetchTime == now)
  }

  test("forceRefetch resets status, retries, signature; asap pulls fetchTime") {
    val sched = DefaultFetchSchedule(cfg)
    val d0 = fresh(sched).copy(status = S.DB_NOTMODIFIED, retries = 2,
      signature = Some("cafe01"), modifiedTime = now,
      fetchTime = now + 999999L)
    val d = sched.forceRefetch(d0, now, asap = true)
    assert(d.status == S.DB_UNFETCHED)
    assert(d.retries == 0)
    assert(d.signature.isEmpty)
    assert(d.modifiedTime == 0L)
    assert(d.fetchTime == now)
    val later = sched.forceRefetch(d0, now, asap = false)
    assert(later.fetchTime == d0.fetchTime)
  }

  test("calculateLastFetchTime: 0 for unfetched, fetchTime - interval else") {
    val sched = DefaultFetchSchedule(cfg)
    val un = fresh(sched)
    assert(sched.calculateLastFetchTime(un) == 0L)
    val f = un.copy(status = S.DB_FETCHED)
    assert(sched.calculateLastFetchTime(f) ==
      f.fetchTime - f.fetchInterval.toLong * 1000)
  }

  test("mime-adaptive: Content-Type selects the inc/dec rate pair") {
    // html shrinks faster than pdf on change when rates say so
    val rates = Map(
      "text/html" -> ((0.4f, 0.5f)),
      "application/pdf" -> ((0.4f, 0.1f)))
    val sched = MimeAdaptiveFetchSchedule(
      cfg.copy(syncDelta = false), rates)
    def withMime(ct: String) = fresh(sched).copy(
      metadata = Map(graft.schemas.CrawlDatum.ContentTypeKey -> ct))
    def nextInterval(ct: String): Int =
      sched.setFetchSchedule("u", withMime(ct), 0L, 0L, now, now,
        FetchSchedule.STATUS_MODIFIED).fetchInterval
    val base = cfg.defaultInterval
    assert(nextInterval("text/html") == math.round(base * 0.5f))
    assert(nextInterval("application/pdf; charset=x") ==
      math.round(base * 0.9f)) // params cleaned before lookup
    // unknown mime → configured default dec rate
    assert(nextInterval("image/webp") ==
      math.round(base * (1.0f - cfg.decRate)))
    // no Content-Type at all → plain adaptive behavior
    val plain = sched.setFetchSchedule("u", fresh(sched), 0L, 0L, now, now,
      FetchSchedule.STATUS_NOTMODIFIED)
    assert(plain.fetchInterval == math.round(base * (1.0f + cfg.incRate)))
  }

  test("mime-adaptive: adaptive-mimetypes.txt parsing") {
    val parsed = MimeAdaptiveFetchSchedule.parseMimeFile(Iterator(
      "# comment", "", "text/html\t0.2\t0.3",
      "Application/PDF; q=1\t0.1\t0.4", "garbage-line"))
    assert(parsed == Map(
      "text/html" -> ((0.2f, 0.3f)),
      "application/pdf" -> ((0.1f, 0.4f))))
  }
}
