package graft.functions

import java.time.{Instant, ZoneOffset, ZonedDateTime}
import java.time.format.DateTimeFormatter
import java.util.Locale

/** X4 — HTTP date handling (net/protocols/HttpDateFormat.java:46-90):
  * emit RFC 7231 IMF-fixdate; parse leniently (single-digit day, any
  * zone name, plus the obsolete RFC 850 and asctime forms servers still
  * send). */
object HttpDates {

  private val Format = DateTimeFormatter
    .ofPattern("EEE, dd MMM yyyy HH:mm:ss 'GMT'", Locale.US)
    .withZone(ZoneOffset.UTC)

  /** Lenient variants tried in order (HttpDateFormat.PARSE_FORMAT plus
    * the RFC 2616 §3.3.1 obsolete forms). */
  private val ParseFormats = Seq(
    DateTimeFormatter.ofPattern("EEE, d MMM yyyy HH:mm:ss z", Locale.US),
    // RFC 850 two-digit year pivots at 1969 (94 → 1994); a 20xx guess
    // would also fail the formatter's day-of-week consistency check
    new java.time.format.DateTimeFormatterBuilder()
      .appendPattern("EEEE, d-MMM-")
      .appendValueReduced(java.time.temporal.ChronoField.YEAR, 2, 2, 1969)
      .appendPattern(" HH:mm:ss z")
      .toFormatter(Locale.US))
  private val Asctime = DateTimeFormatter
    .ofPattern("EEE MMM ppd HH:mm:ss yyyy", Locale.US)

  def toHttpString(epochMs: Long): String =
    Format.format(Instant.ofEpochMilli(epochMs))

  /** Parse to ms epoch; None on garbage (the reference throws
    * ParseException — callers treat it as "no valid date"). */
  def parse(s: String): Option[Long] = {
    if (s == null || s.trim.isEmpty) return None
    val t = s.trim
    ParseFormats.view.flatMap { f =>
      try Some(f.parse(t, (a: java.time.temporal.TemporalAccessor) =>
        ZonedDateTime.from(a)).toInstant.toEpochMilli)
      catch { case _: Exception => None }
    }.headOption.orElse {
      try Some(java.time.LocalDateTime.parse(t, Asctime)
        .toInstant(ZoneOffset.UTC).toEpochMilli)
      catch { case _: Exception => None }
    }
  }
}
