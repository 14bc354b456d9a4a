package graft.crawl

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.schemas.{CrawlDatum, CrawlRow, CrawlStatus => S}

/** The CrawlDb update state machine — the reduce side of `updatedb`
  * (reference: CrawlDbReducer.java:84-355). One URL's datums from the
  * previous db plus the latest segment (fetch statuses, LINKED inlink
  * datums, SIGNATURE / PARSE_META carriers) merge into at most one new db
  * row.
  *
  * Pure and clock-free: `now` is a parameter (the reference calls
  * System.currentTimeMillis inside initializeSchedule); everything else is
  * a deterministic function of the inputs, so the same merge is usable
  * from the Spark operator, the ScalaTest transition matrix, and the
  * column-expression twin that the DuckDB oracle checks.
  */
object UpdateDb {

  /** Classified view of one URL's shuffled datums, built in one streaming
    * pass (the reference classifies in the reducer loop,
    * CrawlDbReducer.java:96-153). Inlinks are kept in a bounded heap of
    * the top `maxInlinks` by score (InlinkPriorityQueue,
    * CrawlDbReducer.java:359-373). */
  final case class Classified(
      old: Option[CrawlDatum],
      fetch: Option[CrawlDatum],
      signature: Option[String],
      parseMeta: Option[Map[String, String]],
      links: Seq[CrawlDatum]) // descending by score

  def classify(values: Iterator[CrawlDatum], maxInlinks: Int): Classified = {
    var old: Option[CrawlDatum] = None
    var fetch: Option[CrawlDatum] = None
    var signature: Option[String] = None
    var parseMeta: Option[Map[String, String]] = None
    // min-heap on score: when over capacity the lowest-scored link drops
    val heap = mutable.PriorityQueue.empty[CrawlDatum](
      Ordering.by((d: CrawlDatum) => -d.score))
    values.foreach { d =>
      if (S.hasDbStatus(d.status)) {
        // always take the latest version (CrawlDbReducer.java:107-111)
        if (old.forall(_.fetchTime < d.fetchTime)) old = Some(d)
      } else if (S.hasFetchStatus(d.status)) {
        if (fetch.forall(_.fetchTime < d.fetchTime)) fetch = Some(d)
      } else d.status match {
        case S.LINKED =>
          heap.enqueue(d)
          if (heap.size > maxInlinks) heap.dequeue() // drop lowest score
        case S.SIGNATURE => signature = d.signature
        case S.PARSE_META => parseMeta = Some(d.metadata)
        case _ => () // unknown transient status: warn-and-skip in the ref
      }
    }
    Classified(old, fetch, signature, parseMeta,
      heap.dequeueAll.reverse) // highest score first
  }

  /** One URL's merge. Returns None when the URL must not enter the db
    * (new URL with additions disallowed, or a lone orphan-less no-op).
    * Port of CrawlDbReducer.java:160-355. */
  def merge(values: Iterator[CrawlDatum], now: Long,
      schedule: FetchSchedule,
      scoring: ScoringFilter = OpicScoring): Option[CrawlDatum] = {
    val cfg = schedule.cfg
    val c = classify(values, cfg.maxInlinks)

    // if it doesn't already exist, skip it (java:162-163)
    if (c.old.isEmpty && !cfg.additionsAllowed) return None

    // no fetched datum: perhaps there is a link (java:166-169)
    val fetchOpt = c.fetch.orElse(c.links.headOption)
    if (fetchOpt.isEmpty)
      // record only unchanged old data, if it exists (java:172-189)
      return c.old.map(scoring.orphanedScore)

    val fetch = fetchOpt.get
    val sig = c.signature.orElse(fetch.signature)
    val prevModifiedTime = c.old.map(_.modifiedTime).getOrElse(0L)
    val prevFetchTime = c.old.map(_.fetchTime).getOrElse(0L)

    // initialize with the latest version, be it fetch or link (java:198-211)
    var result = fetch
    c.old.foreach { o =>
      if (o.metadata.nonEmpty)
        result = result.copy(metadata = o.metadata ++ fetch.metadata)
      if (o.modifiedTime > 0 && fetch.modifiedTime == 0)
        result = result.copy(modifiedTime = o.modifiedTime)
    }

    fetch.status match {
      case S.LINKED => // only inlinks this round (java:215-233)
        result = c.old match {
          case Some(o) => o
          case None =>
            scoring.initialScore(
              schedule.initializeSchedule(result, now)
                .withStatus(S.DB_UNFETCHED))
        }

      case S.FETCH_SUCCESS | S.FETCH_REDIR_TEMP | S.FETCH_REDIR_PERM |
          S.FETCH_NOTMODIFIED => // (java:235-305)
        c.parseMeta.foreach(pm =>
          result = result.copy(metadata = result.metadata ++ pm))
        // modification status: 304 always; signature compare only for
        // plain success, not redirects (NUTCH-1422, java:243-256)
        var modified = FetchSchedule.STATUS_UNKNOWN
        if (fetch.status == S.FETCH_NOTMODIFIED)
          modified = FetchSchedule.STATUS_NOTMODIFIED
        else if (fetch.status == S.FETCH_SUCCESS &&
            c.old.exists(_.signature.isDefined) && sig.isDefined) {
          modified =
            if (c.old.get.signature != sig) FetchSchedule.STATUS_MODIFIED
            else FetchSchedule.STATUS_NOTMODIFIED
        }
        result = schedule.setFetchSchedule("", result, prevFetchTime,
          prevModifiedTime, fetch.fetchTime, fetch.modifiedTime, modified)
        if (modified == FetchSchedule.STATUS_NOTMODIFIED) {
          // NUTCH-1341: reset lastModified too (java:266-273)
          result = result.copy(status = S.DB_NOTMODIFIED,
            modifiedTime = prevModifiedTime)
          c.old.foreach(o => result = result.copy(signature = o.signature))
        } else {
          val st = fetch.status match {
            case S.FETCH_SUCCESS => S.DB_FETCHED
            case S.FETCH_REDIR_PERM => S.DB_REDIR_PERM
            case S.FETCH_REDIR_TEMP => S.DB_REDIR_TEMP
            case _ => c.old.map(_.status).getOrElse(S.DB_UNFETCHED)
          }
          result = result.copy(status = st, signature = sig)
        }
        // interval above system max: force unconditional recrawl so the
        // page can't stick at NOTMODIFIED after its segment is deleted
        // (java:297-303)
        if (cfg.maxInterval < result.fetchInterval)
          result = schedule.forceRefetch(result, now, asap = false)

      case S.FETCH_RETRY => // temporary failure (java:309-321)
        c.old.foreach(o => result = result.copy(signature = o.signature))
        result = schedule.setPageRetrySchedule(result, fetch.fetchTime)
        if (result.retries < cfg.retryMax)
          result = result.withStatus(S.DB_UNFETCHED)
        else {
          result = result.withStatus(S.DB_GONE)
          result = schedule.setPageGoneSchedule(result, fetch.fetchTime)
        }

      case S.PARSE_FAILED => // fetched but unparsable, NUTCH-1732 (java:323-328)
        c.old.foreach(o => result = result.copy(signature = o.signature))
        result = result.withStatus(S.DB_PARSE_FAILED)
        result = schedule.setPageGoneSchedule(result, fetch.fetchTime)

      case S.FETCH_GONE => // permanent failure (java:330-336)
        c.old.foreach(o => result = result.copy(signature = o.signature))
        result = result.withStatus(S.DB_GONE)
        result = schedule.setPageGoneSchedule(result, fetch.fetchTime)

      case _ => // lone SIGNATURE or unknown (java:306-308, 338-340)
        return None
    }

    result = scoring.updateDbScore(c.old, result, c.links)
    // remove generation time, if any (java:346)
    Some(result.copy(metadata = result.metadata - CrawlDatum.GenerateTimeKey))
  }

  /** The distributed operator: previous db ∪ segment outputs, one shuffle
    * on url, streaming per-key merge. groupByKey/flatMapGroups is the
    * typed twin of the reference's reduce; memory per key is O(maxInlinks)
    * because classify() uses a bounded heap, so a URL with millions of
    * inlinks cannot OOM an executor. */
  def apply(updates: Dataset[CrawlRow], now: Long,
      schedule: FetchSchedule,
      scoring: ScoringFilter = OpicScoring): Dataset[CrawlRow] = {
    val spark: SparkSession = updates.sparkSession
    import spark.implicits._
    updates.groupByKey(_.url).flatMapGroups { (url, it) =>
      merge(it.map(_.datum), now, schedule, scoring).map(CrawlRow(url, _))
    }
  }
}
