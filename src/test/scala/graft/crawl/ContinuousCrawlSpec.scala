package graft.crawl

import org.scalatest.funsuite.AnyFunSuite

import graft.schemas.{CrawlDatum, CrawlStatus => S}

/** Continuous-crawl regression scenarios ported from the reference
  * (TestCrawlDbStates.java:330-520 and its ContinuousCrawlTestUtil):
  * repeatedly fetch one URL with a fixed fetch outcome and assert the
  * invariants hold round after round. Clock-free: "time" advances by the
  * datum's own fetchInterval each round.
  */
class ContinuousCrawlSpec extends AnyFunSuite {

  private val t0 = 1700000000000L
  private val cfg = ScheduleConfig()

  private def schedules = Seq(
    "DefaultFetchSchedule" -> DefaultFetchSchedule(cfg),
    "AdaptiveFetchSchedule" -> AdaptiveFetchSchedule(cfg))

  /** One updatedb round: old db row + a fetch outcome at `now`. */
  private def round(old: CrawlDatum, fetchStatus: Byte, now: Long,
      schedule: FetchSchedule, sig: Option[String] = None,
      modifiedTime: Long = 0L): CrawlDatum = {
    val fetch = old.copy(status = fetchStatus, fetchTime = now,
      modifiedTime = modifiedTime, signature = sig)
    val values =
      Iterator(old, fetch) ++
        sig.map(s => CrawlDatum(S.SIGNATURE, 0L, 0, 0, 0f, Some(s), 0L,
          Map.empty)).iterator
    UpdateDb.merge(values, now, schedule).get
  }

  test("NUTCH-1245: fetch_gone always yields db_gone; interval stays capped") {
    for ((name, sched) <- schedules) {
      var d = sched.initializeSchedule(
        CrawlDatum(S.DB_UNFETCHED, 0L, 0, 0, 1.0f, None, 0L, Map.empty), t0)
      var now = t0
      for (r <- 1 to 20) {
        d = round(d, S.FETCH_GONE, now, sched)
        assert(d.status == S.DB_GONE, s"$name round $r: ${S.name(d.status)}")
        assert(d.fetchInterval <= cfg.maxInterval,
          s"$name round $r: interval ${d.fetchInterval} > max")
        assert(d.fetchTime > now, s"$name round $r: fetchTime in the past")
        now = d.fetchTime // next fetch when due
      }
    }
  }

  test("NUTCH-1245 misconfig: default interval > 1.5*max still yields db_gone capped") {
    val bad = cfg.copy(defaultInterval = 3 + (cfg.maxInterval * 1.5).toInt)
    val sched = DefaultFetchSchedule(bad)
    val d0 = sched.initializeSchedule(
      CrawlDatum(S.DB_UNFETCHED, 0L, 0, 0, 1.0f, None, 0L, Map.empty), t0)
    val d = round(d0, S.FETCH_GONE, t0, sched)
    assert(d.status == S.DB_GONE)
    assert(d.fetchInterval <= bad.maxInterval,
      s"interval ${d.fetchInterval} not capped at ${bad.maxInterval}")
  }

  test("NUTCH-578: repeated fetch_retry escalates to db_gone and stays gone") {
    val sched = DefaultFetchSchedule(cfg)
    var d = sched.initializeSchedule(
      CrawlDatum(S.DB_UNFETCHED, 0L, 0, 0, 1.0f, None, 0L, Map.empty), t0)
    var now = t0
    for (r <- 1 to 150) {
      d = round(d, S.FETCH_RETRY, now, sched)
      val expected = if (r < cfg.retryMax) S.DB_UNFETCHED else S.DB_GONE
      assert(d.status == expected,
        s"round $r: ${S.name(d.status)} (expected ${S.name(expected)})")
      now = math.max(d.fetchTime, now + 1000L)
    }
    // no byte-overflow regression: the counter is monotone
    assert(d.retries == 150)
  }

  test("retry counter resets after a successful fetch") {
    val sched = DefaultFetchSchedule(cfg)
    var d = sched.initializeSchedule(
      CrawlDatum(S.DB_UNFETCHED, 0L, 0, 0, 1.0f, None, 0L, Map.empty), t0)
    d = round(d, S.FETCH_RETRY, t0, sched)
    assert(d.retries == 1)
    d = round(d, S.FETCH_SUCCESS, d.fetchTime, sched, sig = Some("aa"))
    assert(d.status == S.DB_FETCHED)
    assert(d.retries == 0) // AbstractFetchSchedule.setFetchSchedule resets
  }

  test("db_notmodified by signature comparison, modifiedTime kept (NUTCH-1341)") {
    for ((name, sched) <- schedules) {
      val sig = Some("cafe01")
      var d = sched.initializeSchedule(
        CrawlDatum(S.DB_UNFETCHED, 0L, 0, 0, 1.0f, None, 0L, Map.empty), t0)
      // first fetch: new content
      d = round(d, S.FETCH_SUCCESS, t0, sched, sig = sig, modifiedTime = t0)
      assert(d.status == S.DB_FETCHED, name)
      assert(d.signature == sig, name)
      val mt = d.modifiedTime
      // second fetch: same signature -> notmodified, modifiedTime unchanged
      val now2 = d.fetchTime
      val d2 = round(d, S.FETCH_SUCCESS, now2, sched, sig = sig)
      assert(d2.status == S.DB_NOTMODIFIED, name)
      assert(d2.modifiedTime == mt, s"$name: modifiedTime reset")
      assert(d2.signature == sig, name)
      // changed signature -> fetched again
      val d3 = round(d2, S.FETCH_SUCCESS, d2.fetchTime, sched,
        sig = Some("beef02"))
      assert(d3.status == S.DB_FETCHED, name)
      assert(d3.signature.contains("beef02"), name)
    }
  }

  test("db_notmodified by HTTP 304 (fetch_notmodified)") {
    for ((name, sched) <- schedules) {
      var d = sched.initializeSchedule(
        CrawlDatum(S.DB_UNFETCHED, 0L, 0, 0, 1.0f, None, 0L, Map.empty), t0)
      d = round(d, S.FETCH_SUCCESS, t0, sched, sig = Some("cafe01"))
      val d2 = round(d, S.FETCH_NOTMODIFIED, d.fetchTime, sched)
      assert(d2.status == S.DB_NOTMODIFIED, name)
      assert(d2.signature.contains("cafe01"), s"$name: old signature kept")
    }
  }

  test("NUTCH-1422: redirects reset the stored signature") {
    for ((name, sched) <- schedules) {
      var d = sched.initializeSchedule(
        CrawlDatum(S.DB_UNFETCHED, 0L, 0, 0, 1.0f, None, 0L, Map.empty), t0)
      d = round(d, S.FETCH_SUCCESS, t0, sched, sig = Some("cafe01"))
      assert(d.signature.isDefined, name)
      // redirect fetch carries no content signature
      val fetch = d.copy(status = S.FETCH_REDIR_TEMP, fetchTime = d.fetchTime,
        signature = None)
      val d2 = UpdateDb.merge(Iterator(d, fetch), d.fetchTime, sched).get
      assert(d2.status == S.DB_REDIR_TEMP, name)
      assert(d2.signature.isEmpty,
        s"$name: signature must be reset on redirect")
    }
  }

  test("interval above db.fetch.interval.max triggers forceRefetch") {
    // adaptive schedule grows the interval on repeated notmodified; once
    // it exceeds maxInterval the reducer forces db_unfetched + reset sig
    val small = cfg.copy(maxInterval = 2 * cfg.defaultInterval,
      adaptiveMaxInterval = 10f * cfg.defaultInterval)
    val sched = AdaptiveFetchSchedule(small)
    var d = sched.initializeSchedule(
      CrawlDatum(S.DB_UNFETCHED, 0L, 0, 0, 1.0f, None, 0L, Map.empty), t0)
    d = round(d, S.FETCH_SUCCESS, t0, sched, sig = Some("cafe01"))
    var forced = false
    var now = d.fetchTime
    for (_ <- 1 to 30 if !forced) {
      d = round(d, S.FETCH_NOTMODIFIED, now, sched)
      now = math.max(d.fetchTime, now + 1000L)
      if (d.status == S.DB_UNFETCHED) {
        forced = true
        assert(d.signature.isEmpty, "forceRefetch must reset the signature")
        assert(d.retries == 0)
      } else assert(d.status == S.DB_NOTMODIFIED)
    }
    assert(forced, "interval never exceeded max — forceRefetch not reached")
  }

  test("NUTCH-1564: adaptive sync_delta never schedules in the past") {
    val c = cfg.copy(defaultInterval = 172800, maxInterval = 604800,
      adaptiveMinInterval = 86400f, adaptiveMaxInterval = 604800f)
    val sched = AdaptiveFetchSchedule(c)
    var d = sched.initializeSchedule(
      CrawlDatum(S.DB_UNFETCHED, 0L, 0, 0, 1.0f, None, 0L, Map.empty), t0)
    // document modified once at t0, then never again; re-check every 8h
    val checkEvery = (FetchSchedule.SecondsPerDay / 3) * 1000L
    d = round(d, S.FETCH_SUCCESS, t0, sched, sig = Some("cafe01"),
      modifiedTime = t0)
    var now = t0
    for (r <- 1 to 100) {
      now += math.max(checkEvery, d.fetchTime - now)
      val d2 = round(d, S.FETCH_SUCCESS, now, sched, sig = Some("cafe01"))
      if (d2.status == S.DB_NOTMODIFIED) {
        assert(d2.fetchTime > now,
          s"round $r: next fetch ${d2.fetchTime} not after now $now")
      }
      d = d2
    }
  }
}
