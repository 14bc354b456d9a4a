package graft.crawl

import org.scalatest.funsuite.AnyFunSuite

import graft.schemas.{CrawlDatum, CrawlStatus => S}

/** Port of the reference's CrawlDb state-transition matrix
  * (TestCrawlDbStates.java:96-198, FIXTURES.md §A8): for both fetch
  * schedules, every db status (including "not in CrawlDb") × every fetch
  * status (including "only inlinks") × 0-2 extra inlinks must produce the
  * expected db status.
  */
class CrawlDbStateMatrixSpec extends AnyFunSuite {

  private val now = 1700000000000L
  private val cfg = ScheduleConfig()

  /** (fetchStatus, dbStatus) counterparts; None = no counterpart
    * (TestCrawlDbStates.java:69-79). */
  private val fetchDbStatusPairs: Seq[(Option[Byte], Option[Byte])] = Seq(
    (None, Some(S.DB_UNFETCHED)),
    (Some(S.FETCH_SUCCESS), Some(S.DB_FETCHED)),
    (Some(S.FETCH_GONE), Some(S.DB_GONE)),
    (Some(S.FETCH_REDIR_TEMP), Some(S.DB_REDIR_TEMP)),
    (Some(S.FETCH_REDIR_PERM), Some(S.DB_REDIR_PERM)),
    (Some(S.FETCH_NOTMODIFIED), Some(S.DB_NOTMODIFIED)),
    (Some(S.FETCH_RETRY), None),
    (None, Some(S.DB_DUPLICATE)),
    (None, Some(S.DB_ORPHAN)))

  private val schedules: Seq[(String, FetchSchedule)] = Seq(
    "DefaultFetchSchedule" -> DefaultFetchSchedule(cfg),
    "AdaptiveFetchSchedule" -> AdaptiveFetchSchedule(cfg))

  /** A LINKED datum as produced by the link inverter
    * (TestCrawlDbStates.java:88-90). */
  private val linked = CrawlDatum(S.LINKED, 0L, 0, cfg.defaultInterval, 0.1f,
    None, 0L, Map.empty)

  test("state transition matrix (both schedules, 0-2 inlinks)") {
    for ((schedName, schedule) <- schedules) {
      for ((_, fromDbStatusOpt) <- fetchDbStatusPairs) {
        val fromDb = fromDbStatusOpt.map { st =>
          schedule.initializeSchedule(
            CrawlDatum(st, 0L, 0, 0, 1.0f, None, 0L, Map.empty), now)
        }
        for ((fetchStatusOpt, toDbOpt) <- fetchDbStatusPairs) {
          // expected status (TestCrawlDbStates.java:135-151)
          val expected: Byte = fetchStatusOpt match {
            case None => fromDbStatusOpt.getOrElse(S.DB_UNFETCHED)
            case Some(S.FETCH_RETRY) =>
              if (fromDb.forall(_.retries < cfg.retryMax)) S.DB_UNFETCHED
              else S.DB_GONE
            case Some(_) => toDbOpt.get
          }
          for (nLinks <- 0 to 2) {
            if (!(fetchStatusOpt.isEmpty && nLinks == 0)) {
              val fetch = fetchStatusOpt.map { fs =>
                fromDb.getOrElse(
                  schedule.initializeSchedule(
                    CrawlDatum(0, 0L, 0, 0, 1.0f, None, 0L, Map.empty), now))
                  .copy(status = fs, fetchTime = now)
              }
              val values =
                fromDb.toSeq ++ fetch.toSeq ++ Seq.fill(nLinks)(linked)
              val res = UpdateDb.merge(values.iterator, now, schedule)
              assert(res.isDefined,
                s"$schedName: ${fromDbStatusOpt.map(S.name)} + " +
                  s"${fetchStatusOpt.map(S.name)} + $nLinks links: no result")
              assert(res.get.status == expected,
                s"$schedName: ${fromDbStatusOpt.map(S.name).getOrElse("<absent>")} + " +
                  s"${fetchStatusOpt.map(S.name).getOrElse("<only inlinks>")} + " +
                  s"$nLinks links => ${S.name(res.get.status)} " +
                  s"(expected ${S.name(expected)})")
            }
          }
        }
      }
    }
  }

  test("new url with additions disallowed is dropped") {
    val sched = DefaultFetchSchedule(cfg.copy(additionsAllowed = false))
    val res = UpdateDb.merge(Iterator(linked), now, sched)
    assert(res.isEmpty)
  }

  test("OPIC inlink cash accumulates onto the old score") {
    val sched = DefaultFetchSchedule(cfg)
    val old = sched.initializeSchedule(
      CrawlDatum(S.DB_FETCHED, 0L, 0, 0, 1.0f, None, 0L, Map.empty), now)
    val res = UpdateDb.merge(
      Iterator(old, linked.copy(score = 0.25f), linked.copy(score = 0.5f)),
      now, sched).get
    assert(res.score === 1.75f)
    assert(res.status == S.DB_FETCHED) // unchanged, no fetch this round
  }

  test("inlink heap keeps only the top maxInlinks scores") {
    val sched = DefaultFetchSchedule(cfg.copy(maxInlinks = 2))
    val links = Seq(0.125f, 0.5f, 0.25f, 0.375f).map(s => linked.copy(score = s))
    val res = UpdateDb.merge(links.iterator, now, sched).get
    // kept: 0.5 + 0.375; initial score of a new page is 0 (OPIC)
    assert(res.score === 0.875f)
    assert(res.status == S.DB_UNFETCHED)
  }

  test("generate-time marker is stripped from the result metadata") {
    val sched = DefaultFetchSchedule(cfg)
    val old = sched.initializeSchedule(
      CrawlDatum(S.DB_UNFETCHED, 0L, 0, 0, 1.0f, None, 0L,
        Map(CrawlDatum.GenerateTimeKey -> now.toString, "k" -> "v")), now)
    val fetch = old.copy(status = S.FETCH_SUCCESS, fetchTime = now)
    val res = UpdateDb.merge(Iterator(old, fetch), now, sched).get
    assert(!res.metadata.contains(CrawlDatum.GenerateTimeKey))
    assert(res.metadata("k") == "v")
  }

  test("parse metadata overlays the merged metadata (NUTCH-1656)") {
    val sched = DefaultFetchSchedule(cfg)
    val old = sched.initializeSchedule(
      CrawlDatum(S.DB_UNFETCHED, 0L, 0, 0, 1.0f, None, 0L,
        Map("a" -> "old", "b" -> "old")), now)
    val fetch = old.copy(status = S.FETCH_SUCCESS, fetchTime = now,
      metadata = Map("b" -> "fetch"))
    val pm = CrawlDatum(S.PARSE_META, 0L, 0, 0, 0f, None, 0L,
      Map("c" -> "parse"))
    val res = UpdateDb.merge(Iterator(old, fetch, pm), now, sched).get
    assert(res.metadata == Map("a" -> "old", "b" -> "fetch", "c" -> "parse"))
  }
}
