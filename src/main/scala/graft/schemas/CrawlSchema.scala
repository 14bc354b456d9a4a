package graft.schemas

/** CrawlDb status codes — three namespaces: db 0x01-0x09, fetch
  * 0x21-0x26, transient 0x41-0x45 (reference: CrawlDatum.java:63-109).
  */
object CrawlStatus {
  val DB_UNFETCHED: Byte = 0x01
  val DB_FETCHED: Byte = 0x02
  val DB_GONE: Byte = 0x03
  val DB_REDIR_TEMP: Byte = 0x04
  val DB_REDIR_PERM: Byte = 0x05
  val DB_NOTMODIFIED: Byte = 0x06
  val DB_DUPLICATE: Byte = 0x07
  val DB_ORPHAN: Byte = 0x08
  val DB_PARSE_FAILED: Byte = 0x09
  val DB_MAX: Byte = 0x1f

  val FETCH_SUCCESS: Byte = 0x21
  val FETCH_RETRY: Byte = 0x22
  val FETCH_REDIR_TEMP: Byte = 0x23
  val FETCH_REDIR_PERM: Byte = 0x24
  val FETCH_GONE: Byte = 0x25
  val FETCH_NOTMODIFIED: Byte = 0x26
  val FETCH_MAX: Byte = 0x3f

  val SIGNATURE: Byte = 0x41
  val INJECTED: Byte = 0x42
  val LINKED: Byte = 0x43
  val PARSE_META: Byte = 0x44
  val PARSE_FAILED: Byte = 0x45

  /** Partition predicates (CrawlDatum.java:154-161). */
  def hasDbStatus(status: Byte): Boolean =
    status > 0 && status <= DB_MAX
  def hasFetchStatus(status: Byte): Boolean =
    status > DB_MAX && status <= FETCH_MAX

  val names: Map[Byte, String] = Map(
    DB_UNFETCHED -> "db_unfetched",
    DB_FETCHED -> "db_fetched",
    DB_GONE -> "db_gone",
    DB_REDIR_TEMP -> "db_redir_temp",
    DB_REDIR_PERM -> "db_redir_perm",
    DB_NOTMODIFIED -> "db_notmodified",
    DB_DUPLICATE -> "db_duplicate",
    DB_ORPHAN -> "db_orphan",
    DB_PARSE_FAILED -> "db_parse_failed",
    FETCH_SUCCESS -> "fetch_success",
    FETCH_RETRY -> "fetch_retry",
    FETCH_REDIR_TEMP -> "fetch_redir_temp",
    FETCH_REDIR_PERM -> "fetch_redir_perm",
    FETCH_GONE -> "fetch_gone",
    FETCH_NOTMODIFIED -> "fetch_notmodified",
    SIGNATURE -> "signature",
    INJECTED -> "injected",
    LINKED -> "linked",
    PARSE_META -> "parse_meta",
    PARSE_FAILED -> "parse_failed")

  def name(status: Byte): String = names.getOrElse(status, s"unknown_$status")
}

/** One CrawlDb record (reference: CrawlDatum.java:144-151).
  *
  * Differences from the reference's hand-serialized Writable, per
  * SURVEY §1.3: the signature (a ≤256-byte MD5/TextProfile digest,
  * CrawlDatum.java:264-269) is carried as its lowercase hex string —
  * losslessly comparable, Parquet/Encoder friendly; metadata is a
  * String→String map (the reference stringifies for JEXL anyway,
  * CrawlDatum.java:589-613).
  *
  * Times are ms epoch; fetchInterval is whole seconds (the reference
  * stores int and Math.round()s float setters, CrawlDatum.java:244-249).
  */
final case class CrawlDatum(
    status: Byte,
    fetchTime: Long,
    retries: Int,
    fetchInterval: Int,
    score: Float,
    signature: Option[String],
    modifiedTime: Long,
    metadata: Map[String, String]) {

  def statusName: String = CrawlStatus.name(status)

  def withStatus(s: Byte): CrawlDatum = copy(status = s)

  /** setFetchInterval(float) — reference Math.round()s (CrawlDatum.java:248). */
  def withIntervalF(seconds: Float): CrawlDatum =
    copy(fetchInterval = math.round(seconds))
}

object CrawlDatum {
  /** Generate-time marker metadata key (Nutch.WRITABLE_GENERATE_TIME_KEY,
    * stripped by the updatedb reducer, CrawlDbReducer.java:346). */
  val GenerateTimeKey = "_ngt_"
  /** Fixed re-fetch interval override (Nutch.WRITABLE_FIXED_INTERVAL_KEY,
    * honored by AdaptiveFetchSchedule.java:216-222). */
  val FixedIntervalKey = "fixedInterval"
  /** Representative-URL marker (redirects). */
  val ReprUrlKey = "_repr_"
  /** Fetched content type (HttpHeaders.WRITABLE_CONTENT_TYPE) — read by
    * MimeAdaptiveFetchSchedule for per-MIME inc/dec rates. */
  val ContentTypeKey = "Content-Type"

  def unfetched(now: Long, interval: Int, score: Float = 0.0f): CrawlDatum =
    CrawlDatum(CrawlStatus.DB_UNFETCHED, now, 0, interval, score, None, 0L,
      Map.empty)
}

/** A url-keyed CrawlDb row — the unit every crawldb-keyed operator
  * shuffles on (FIXTURES.md §A2). */
final case class CrawlRow(url: String, datum: CrawlDatum)
