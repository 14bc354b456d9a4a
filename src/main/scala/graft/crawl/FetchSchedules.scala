package graft.crawl

import graft.schemas.{CrawlDatum, CrawlStatus}

/** Re-crawl scheduling (SURVEY §2.11).
  *
  * Pure functions over CrawlDatum — no clocks (the reference calls
  * System.currentTimeMillis in initializeSchedule; here `now` is a
  * parameter so every caller, including the oracle queries, is
  * deterministic). Semantics track:
  *   - AbstractFetchSchedule.java:67-230 (init / gone / retry /
  *     shouldFetch / forceRefetch)
  *   - DefaultFetchSchedule.java:30-48
  *   - AdaptiveFetchSchedule.java:100-270 (inc/dec rates, clamping,
  *     SYNC_DELTA re-anchoring, fixedInterval metadata override)
  */
object FetchSchedule {
  /** Modification states passed into setFetchSchedule
    * (FetchSchedule.java constants). */
  val STATUS_UNKNOWN = 0
  val STATUS_MODIFIED = 1
  val STATUS_NOTMODIFIED = 2

  val SecondsPerDay = 3600L * 24L
}

/** Knobs shared by the schedules and the updatedb state machine
  * (defaults = conf/nutch-default.xml values). */
final case class ScheduleConfig(
    defaultInterval: Int = 2592000, // db.fetch.interval.default (30 d)
    maxInterval: Int = 7776000, // db.fetch.interval.max (90 d)
    retryMax: Int = 3, // db.fetch.retry.max
    additionsAllowed: Boolean = true, // db.update.additions.allowed
    maxInlinks: Int = 10000, // db.update.max.inlinks
    incRate: Float = 0.4f, // db.fetch.schedule.adaptive.inc_rate
    decRate: Float = 0.2f, // db.fetch.schedule.adaptive.dec_rate
    adaptiveMinInterval: Float = 60.0f,
    adaptiveMaxInterval: Float = 31536000.0f, // 1 year
    syncDelta: Boolean = true,
    syncDeltaRate: Double = 0.3)

sealed trait FetchSchedule {
  def cfg: ScheduleConfig

  /** AbstractFetchSchedule.initializeSchedule (java:67-73). */
  def initializeSchedule(d: CrawlDatum, now: Long): CrawlDatum =
    d.copy(fetchTime = now, fetchInterval = cfg.defaultInterval, retries = 0)

  /** Successful-fetch rescheduling; base resets the retry counter
    * (AbstractFetchSchedule.java:84-90). */
  def setFetchSchedule(url: String, d: CrawlDatum, prevFetchTime: Long,
      prevModifiedTime: Long, fetchTime: Long, modifiedTime: Long,
      state: Int): CrawlDatum =
    d.copy(retries = 0)

  /** GONE pages: interval grows 50%, capped at 0.9·max
    * (AbstractFetchSchedule.java:105-115). */
  def setPageGoneSchedule(d: CrawlDatum, fetchTime: Long): CrawlDatum = {
    val d2 =
      if (d.fetchInterval * 1.5f < cfg.maxInterval)
        d.withIntervalF(d.fetchInterval * 1.5f)
      else d.withIntervalF(cfg.maxInterval * 0.9f)
    d2.copy(fetchTime = fetchTime + d2.fetchInterval.toLong * 1000)
  }

  /** Transient failure: retry in 1 day, bump the retry counter
    * (AbstractFetchSchedule.java:140-146). */
  def setPageRetrySchedule(d: CrawlDatum, fetchTime: Long): CrawlDatum =
    d.copy(fetchTime = fetchTime + FetchSchedule.SecondsPerDay * 1000,
      retries = d.retries + 1)

  /** AbstractFetchSchedule.calculateLastFetchTime (java:153-159). */
  def calculateLastFetchTime(d: CrawlDatum): Long =
    if (d.status == CrawlStatus.DB_UNFETCHED) 0L
    else d.fetchTime - d.fetchInterval.toLong * 1000

  /** Generator eligibility gate; may also adjust a too-remote fetchTime
    * (AbstractFetchSchedule.java:190-203). Returns the (possibly
    * adjusted) datum alongside the verdict. */
  def shouldFetch(d: CrawlDatum, curTime: Long): (Boolean, CrawlDatum) = {
    var adj = d
    if (adj.fetchTime - curTime > cfg.maxInterval.toLong * 1000) {
      if (adj.fetchInterval > cfg.maxInterval)
        adj = adj.withIntervalF(cfg.maxInterval * 0.9f)
      adj = adj.copy(fetchTime = curTime)
    }
    (adj.fetchTime <= curTime, adj)
  }

  /** Force an unconditional refetch (AbstractFetchSchedule.java:215-230). */
  def forceRefetch(d: CrawlDatum, now: Long, asap: Boolean): CrawlDatum = {
    val d2 =
      if (d.fetchInterval > cfg.maxInterval) d.withIntervalF(cfg.maxInterval * 0.9f)
      else d
    d2.copy(status = CrawlStatus.DB_UNFETCHED, retries = 0, signature = None,
      modifiedTime = 0L,
      fetchTime = if (asap) now else d2.fetchTime)
  }
}

/** Fixed interval regardless of change detection
  * (DefaultFetchSchedule.java:30-48). */
final case class DefaultFetchSchedule(cfg: ScheduleConfig = ScheduleConfig())
    extends FetchSchedule {

  override def setFetchSchedule(url: String, d0: CrawlDatum,
      prevFetchTime: Long, prevModifiedTime: Long, fetchTime: Long,
      modifiedTime0: Long, state: Int): CrawlDatum = {
    var d = super.setFetchSchedule(url, d0, prevFetchTime, prevModifiedTime,
      fetchTime, modifiedTime0, state)
    if (d.fetchInterval == 0) d = d.copy(fetchInterval = cfg.defaultInterval)
    d = d.copy(fetchTime = fetchTime + d.fetchInterval.toLong * 1000)
    val modifiedTime =
      if (modifiedTime0 <= 0 || state == FetchSchedule.STATUS_MODIFIED) fetchTime
      else modifiedTime0
    d.copy(modifiedTime = modifiedTime)
  }
}

/** Interval shrinks ×(1−DEC_RATE) on change, grows ×(1+INC_RATE) on
  * no-change, clamped to [min,max]; optional SYNC_DELTA re-anchors the
  * next fetch toward the modification time
  * (AdaptiveFetchSchedule.java:204-270). */
final case class AdaptiveFetchSchedule(cfg: ScheduleConfig = ScheduleConfig())
    extends FetchSchedule {

  override def setFetchSchedule(url: String, d0: CrawlDatum,
      prevFetchTime: Long, prevModifiedTime: Long, fetchTime: Long,
      modifiedTime0: Long, state: Int): CrawlDatum = {
    val d = super.setFetchSchedule(url, d0, prevFetchTime, prevModifiedTime,
      fetchTime, modifiedTime0, state)
    var interval: Float =
      if (d.fetchInterval == 0) cfg.defaultInterval.toFloat
      else d.fetchInterval.toFloat
    var refTime = fetchTime
    var modifiedTime = modifiedTime0

    val fixed = d.metadata.get(CrawlDatum.FixedIntervalKey)
      .flatMap(v => scala.util.Try(v.toFloat).toOption)
    fixed match {
      case Some(f) =>
        // preset interval wins; no adjustment, no clamping (java:216-222)
        interval = f
      case None =>
        if (modifiedTime <= 0) modifiedTime = fetchTime
        state match {
          case FetchSchedule.STATUS_MODIFIED =>
            interval *= (1.0f - cfg.decRate); modifiedTime = fetchTime
          case FetchSchedule.STATUS_NOTMODIFIED =>
            interval *= (1.0f + cfg.incRate)
          case _ => // STATUS_UNKNOWN: leave as is
        }
        if (cfg.syncDelta) {
          val delta = fetchTime - modifiedTime
          if (delta > interval * 1000) interval = (delta / 1000L).toFloat
          var offset = math.round(delta * cfg.syncDeltaRate)
          val maxIntervalMillis = cfg.adaptiveMaxInterval.toLong * 1000L
          if (delta > 0 && offset > maxIntervalMillis)
            offset = offset / delta * maxIntervalMillis
          refTime = fetchTime - offset
        }
        if (interval < cfg.adaptiveMinInterval) interval = cfg.adaptiveMinInterval
        else if (interval > cfg.adaptiveMaxInterval) interval = cfg.adaptiveMaxInterval
    }

    d.withIntervalF(interval)
      .copy(fetchTime = refTime + math.round(interval * 1000.0),
        modifiedTime = modifiedTime)
  }
}

/** Adaptive schedule with per-MIME inc/dec rates
  * (MimeAdaptiveFetchSchedule.java:60-135 + adaptive-mimetypes.txt):
  * the fetched Content-Type (stamped into datum metadata by Fetch)
  * selects the rate pair; unknown types fall back to the configured
  * defaults, then delegates to the adaptive arithmetic. */
final case class MimeAdaptiveFetchSchedule(
    cfg: ScheduleConfig = ScheduleConfig(),
    mimeRates: Map[String, (Float, Float)] =
      MimeAdaptiveFetchSchedule.DefaultRates) extends FetchSchedule {

  override def setFetchSchedule(url: String, d0: CrawlDatum,
      prevFetchTime: Long, prevModifiedTime: Long, fetchTime: Long,
      modifiedTime0: Long, state: Int): CrawlDatum = {
    val mime = d0.metadata.get(CrawlDatum.ContentTypeKey)
      .map(MimeAdaptiveFetchSchedule.cleanMimeType)
    val eff = mime.flatMap(mimeRates.get) match {
      case Some((inc, dec)) => cfg.copy(incRate = inc, decRate = dec)
      case None => cfg
    }
    AdaptiveFetchSchedule(eff).setFetchSchedule(url, d0, prevFetchTime,
      prevModifiedTime, fetchTime, modifiedTime0, state)
  }
}

object MimeAdaptiveFetchSchedule {

  /** MimeUtil.cleanMimeType analog: drop parameters, lowercase. */
  def cleanMimeType(ct: String): String =
    ct.takeWhile(_ != ';').trim.toLowerCase

  /** Parse the tab-separated `adaptive-mimetypes.txt` format:
    * `mime<TAB>inc_rate<TAB>dec_rate`, '#' comments. */
  def parseMimeFile(lines: Iterator[String]): Map[String, (Float, Float)] =
    lines.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .flatMap { l =>
        l.split("\t").map(_.trim).filter(_.nonEmpty) match {
          case Array(m, inc, dec) =>
            scala.util.Try(
              (cleanMimeType(m), (inc.toFloat, dec.toFloat))).toOption
          case _ => None
        }
      }.toMap

  /** Sensible defaults mirroring the template's intent: volatile HTML
    * adapts fast, static media slowly. */
  val DefaultRates: Map[String, (Float, Float)] = Map(
    "text/html" -> ((0.2f, 0.2f)),
    "application/xhtml+xml" -> ((0.2f, 0.2f)),
    "application/pdf" -> ((0.1f, 0.4f)),
    "image/jpeg" -> ((0.05f, 0.5f)),
    "image/png" -> ((0.05f, 0.5f)))
}
