package graft.plugins

import java.util.regex.Pattern

import graft.functions.HttpDates

/** The indexing-filter plugin family beyond index-basic: the scalar
  * semantics of index-anchor (AnchorIndexingFilter.java:85-112),
  * index-more (MoreIndexingFilter.java:112-310) and parse-metatags
  * (MetaTagsParser.java:68-124), expressed as pure functions so they run
  * either inside the Index cogroup's column expressions or as one-pass
  * UDFs — map-only either way, no extra shuffle at 100 TB.
  */
object IndexingFilters {

  // -------------------------------------------------------------------------
  // index-anchor
  // -------------------------------------------------------------------------

  /** Case-insensitive anchor dedup keeping first occurrence in original
    * case (AnchorIndexingFilter.filter:85-112 with
    * anchorIndexingFilter.deduplicate=true). */
  def dedupAnchors(anchors: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.HashSet.empty[String]
    anchors.filter(a => a != null && seen.add(a.toLowerCase))
  }

  // -------------------------------------------------------------------------
  // index-more
  // -------------------------------------------------------------------------

  /** Strip mime parameters + whitespace, lowercase
    * (MimeUtil.cleanMimeType semantics: `text/HTML; charset=utf-8` →
    * `text/html`). Empty/null → None. */
  def cleanMimeType(contentType: String): Option[String] =
    Option(contentType).map(_.takeWhile(_ != ';').trim.toLowerCase)
      .filter(_.nonEmpty)

  /** The `type` multivalue: full mime plus its primary and sub parts
    * (addType + getParts, MoreIndexingFilter.java:202-274). */
  def typeFields(contentType: String): Seq[String] =
    cleanMimeType(contentType) match {
      case None => Nil
      case Some(mt) => mt +: mt.split("/").toSeq.filter(_.nonEmpty)
    }

  /** Fallback date styles tried when the HTTP-date parse fails
    * (MoreIndexingFilter.defaultDateStyles:96-110 — the subset with
    * unambiguous, zone-free forms; the reference's zone'd variants go
    * through HttpDates.parse already). */
  private val fallbackStyles = Seq(
    "yyyy/MM/dd HH:mm:ss.SSS", "yyyy/MM/dd HH:mm:ss", "yyyy/MM/dd",
    "yyyy.MM.dd HH:mm:ss", "yyyy-MM-dd HH:mm",
    "dd.MM.yyyy HH:mm:ss", "dd.MM.yyyy; HH:mm:ss")
    .map(p => java.time.format.DateTimeFormatter.ofPattern(p,
      java.util.Locale.US))

  /** Parse a Last-Modified header: RFC HTTP-date first, then the lenient
    * fallback styles (getTime, MoreIndexingFilter.java:153-170). */
  def parseDateMs(s: String): Option[Long] = {
    if (s == null || s.trim.isEmpty) return None
    HttpDates.parse(s).orElse {
      val t = s.trim
      fallbackStyles.view.flatMap { f =>
        try {
          val ta = f.parseBest(t,
            (a: java.time.temporal.TemporalAccessor) =>
              java.time.LocalDateTime.from(a),
            (a: java.time.temporal.TemporalAccessor) =>
              java.time.LocalDate.from(a))
          ta match {
            case d: java.time.LocalDateTime =>
              Some(d.toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
            case d: java.time.LocalDate =>
              Some(d.atStartOfDay.toInstant(java.time.ZoneOffset.UTC)
                .toEpochMilli)
            case _ => None
          }
        } catch { case _: Exception => None }
      }.headOption
    }
  }

  /** The indexed `date`: last-modified when parseable, else the datum's
    * modified time when set, else fetch time (addTime,
    * MoreIndexingFilter.java:126-151). Returns (lastModifiedMs, dateMs):
    * lastModified is only emitted when the header parsed. */
  def docDate(lastModifiedHeader: Option[String], modifiedMs: Long,
      fetchMs: Long): (Option[Long], Long) = {
    val lm = lastModifiedHeader.flatMap(parseDateMs)
    (lm, lm.getOrElse(if (modifiedMs > 0) modifiedMs else fetchMs))
  }

  private val dispositionPatterns = Seq(
    Pattern.compile("\\bfilename=['\"]([^\"]+)"),
    Pattern.compile("\\bfilename=(\\S+)\\b"))

  /** Filename from a Content-Disposition header, used to reset a missing
    * title (resetTitle, MoreIndexingFilter.java:287-310; quoted form
    * wins over the bare token). */
  def dispositionFilename(contentDisposition: String): Option[String] =
    Option(contentDisposition).flatMap { cd =>
      dispositionPatterns.view.flatMap { p =>
        val m = p.matcher(cd)
        if (m.find()) Some(m.group(1)) else None
      }.headOption
    }

  /** Content-Length trimmed; blank → absent (addLength + NUTCH-1010,
    * MoreIndexingFilter.java:173-184). */
  def contentLength(header: String): Option[String] =
    Option(header).map(_.trim).filter(_.nonEmpty)

  // -------------------------------------------------------------------------
  // index-static / tld / urlmeta / index-metadata — Registry-pluggable
  // Extensions.IndexingFilter impls (the doc/url/datum-shaped members of
  // the family; anchor/more/metatags need parse+inlinks context and live
  // as the scalar functions above)
  // -------------------------------------------------------------------------

  import graft.plugins.Extensions.IndexingFilter
  import graft.schemas.CrawlDatum

  /** index-static StaticFieldIndexer.java:62-75: add fixed field:value
    * pairs to every document (multivalues joined by the caller's
    * convention — doc is a flat Map here, so last write wins like a
    * single-valued field). */
  final class StaticIndexingFilter(fields: Map[String, String])
      extends IndexingFilter {
    def filter(doc: Map[String, String], url: String,
        datum: CrawlDatum): Option[Map[String, String]] =
      Some(doc ++ fields)
  }

  object StaticIndexingFilter {
    /** `index.static` syntax: comma-separated `name:value` pairs
      * (parseFields, StaticFieldIndexer.java:84-99). */
    def parseFields(spec: String): Map[String, String] =
      spec.split(",").iterator.flatMap { f =>
        f.split(":") match {
          case Array(k, v) => Some(k.trim -> v.trim)
          case _ => None
        }
      }.toMap
  }

  /** tld TLDIndexingFilter.java:50-63: the URL's public-suffix as a
    * `tld` field (PSL-backed, like URLUtil.getDomainSuffix). */
  final class TldIndexingFilter extends IndexingFilter {
    def filter(doc: Map[String, String], url: String,
        datum: CrawlDatum): Option[Map[String, String]] = {
      val host = graft.net.UrlParts.host(url)
      val suffix = host.flatMap(h =>
        Option(graft.functions.Psl.domainSuffix(h)))
      Some(suffix.fold(doc)(s => doc + ("tld" -> s)))
    }
  }

  /** urlmeta URLMetaIndexingFilter.java:80-95: configured datum-metadata
    * keys become document fields when present. */
  final class UrlMetaIndexingFilter(tags: Seq[String])
      extends IndexingFilter {
    def filter(doc: Map[String, String], url: String,
        datum: CrawlDatum): Option[Map[String, String]] =
      Some(tags.foldLeft(doc)((d, tag) =>
        datum.metadata.get(tag).fold(d)(v => d + (tag -> v))))
  }

  /** index-metadata MetadataIndexer.java: datum-metadata keys become
    * document fields under an `meta_` prefix (the datum carries the
    * parse/content metadata the reference's three source maps feed). */
  final class MetadataIndexingFilter(keys: Seq[String])
      extends IndexingFilter {
    def filter(doc: Map[String, String], url: String,
        datum: CrawlDatum): Option[Map[String, String]] =
      Some(keys.foldLeft(doc)((d, k) =>
        datum.metadata.get(k).fold(d)(v => d + (s"meta_$k" -> v))))
  }

  // -------------------------------------------------------------------------
  // parse-metatags
  // -------------------------------------------------------------------------

  /** Meta tags → `metatag.<name>` parse-metadata entries, keeping
    * document order and multivalues; `names` filters which tags survive
    * ("*" keeps all) — MetaTagsParser.filter:97-124 over the general and
    * http-equiv groups. */
  def metatagEntries(tags: graft.ops.Html.MetaTags,
      names: Set[String] = Set("*")): Seq[(String, String)] = {
    val keep = (n: String) => names.contains("*") || names.contains(n)
    (tags.general ++ tags.httpEquiv).collect {
      case (n, v) if keep(n) => s"metatag.$n" -> v
    }
  }
}
