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
  // index-arbitrary (ArbitraryIndexingFilter.java:158-313)
  // -------------------------------------------------------------------------

  /** index-arbitrary: a user-supplied value function adds/overwrites one
    * document field. The reference reflection-instantiates a POJO per
    * document (url prepended to the constructor args) and calls a
    * configured method; the Scala-first seam is the function itself —
    * `fn(url, doc)` — with [[ArbitraryIndexingFilter.reflective]]
    * reproducing the reference's Class.forName wiring for POJO reuse.
    *
    * Add-vs-overwrite follows doc.add/removeField semantics mapped onto
    * the flat doc map: existing value + add → multivalue joined with
    * `|`; overwrite → replaced; a None result under overwrite clears the
    * field (the reference's remove-then-add-null path). */
  final class ArbitraryIndexingFilter(fieldName: String,
      fn: (String, Map[String, String]) => Option[String],
      overwrite: Boolean = false) extends IndexingFilter {
    def filter(doc: Map[String, String], url: String,
        datum: CrawlDatum): Option[Map[String, String]] =
      fn(url, doc) match {
        case Some(v) =>
          val merged = doc.get(fieldName) match {
            case Some(prev) if !overwrite => s"$prev|$v"
            case _ => v
          }
          Some(doc + (fieldName -> merged))
        case None =>
          Some(if (overwrite) doc - fieldName else doc)
      }
  }

  object ArbitraryIndexingFilter {
    /** The reference's reflection path (filter(),
      * ArbitraryIndexingFilter.java:177-243): instantiate
      * `className(String[])` with the document URL prepended to
      * `constructorArgs`, call `methodName` — no-arg, or
      * `(String[])`-arg when `methodArgs` is non-empty — and use the
      * result's toString as the field value. Reflection failures skip
      * the field (the reference logs and continues). */
    def reflective(fieldName: String, className: String,
        constructorArgs: Seq[String] = Nil, methodName: String,
        methodArgs: Seq[String] = Nil, overwrite: Boolean = false)
        : ArbitraryIndexingFilter =
      new ArbitraryIndexingFilter(fieldName, (url, _) => {
        try {
          val cls = Class.forName(className)
          val ctor = cls.getDeclaredConstructor(classOf[Array[String]])
          // single String[] argument, not varargs-spread
          val instance = ctor.newInstance(
            (url +: constructorArgs).toArray: AnyRef)
          val result =
            if (methodArgs.nonEmpty)
              cls.getDeclaredMethod(methodName, classOf[Array[String]])
                .invoke(instance, methodArgs.toArray: AnyRef)
            else cls.getMethod(methodName).invoke(instance)
          Option(result).map(_.toString)
        } catch { case _: ReflectiveOperationException => None }
      }, overwrite)
  }

  // -------------------------------------------------------------------------
  // index-links (LinksIndexingFilter.java:69-160)
  // -------------------------------------------------------------------------

  /** Outlink/inlink document fields: each link URL (or, in hosts-only
    * mode, its deduped lowercase host), with optional suppression of
    * links pointing to/from the document's own host
    * (index.links.outlinks.host.ignore / inlinks.host.ignore /
    * hosts.only). Returns (outlinkFields, inlinkFields). */
  def linkFields(url: String, outlinks: Seq[String], inlinks: Seq[String],
      ignoreSameHostOut: Boolean = false, ignoreSameHostIn: Boolean = false,
      hostsOnly: Boolean = false): (Seq[String], Seq[String]) = {
    val docHost = graft.net.UrlParts.host(url).map(_.toLowerCase)
    def side(links: Seq[String], ignoreSame: Boolean): Seq[String] = {
      val seen = scala.collection.mutable.HashSet.empty[String]
      links.flatMap { link =>
        graft.net.UrlParts.host(link).map(_.toLowerCase) match {
          case None => None // malformed: logged + skipped in the reference
          case Some(h) =>
            val value = if (hostsOnly) h else link
            if (hostsOnly && !seen.add(h)) None
            else if (ignoreSame && docHost.contains(h)) None
            else Some(value)
        }
      }
    }
    (side(outlinks, ignoreSameHostOut), side(inlinks, ignoreSameHostIn))
  }

  // -------------------------------------------------------------------------
  // index-replace (ReplaceIndexer.java:128-290, FieldReplacer.java)
  // -------------------------------------------------------------------------

  /** One `field[:toField]=/regexp/replacement/[flags]` instruction. */
  final case class FieldReplacer(field: String, toField: String,
      pattern: Pattern, replacement: String) extends Serializable {
    def replace(value: String): String =
      pattern.matcher(value).replaceAll(replacement)
  }

  /** Replacement sets keyed by host- or url-match patterns, applied in
    * declaration order. */
  final case class ReplaceConf(
      byHost: Seq[(Pattern, Seq[FieldReplacer])],
      byUrl: Seq[(Pattern, Seq[FieldReplacer])]) extends Serializable {

    /** Apply every matching set to the doc (doReplace,
      * ReplaceIndexer.java:250-290: the key field — host or url — must
      * match the set's pattern; each replacer rewrites its source
      * field's value into the target field when the field exists). */
    def apply(doc: Map[String, String]): Map[String, String] = {
      def run(d: Map[String, String], key: String,
          sets: Seq[(Pattern, Seq[FieldReplacer])]): Map[String, String] =
        d.get(key) match {
          case None => d
          case Some(keyValue) =>
            sets.foldLeft(d) { case (acc, (p, replacers)) =>
              if (!p.matcher(keyValue).matches()) acc
              else replacers.foldLeft(acc) { (m, r) =>
                m.get(r.field).fold(m)(v => m + (r.toField -> r.replace(v)))
              }
            }
        }
      run(run(doc, "host", byHost), "url", byUrl)
    }
  }

  object ReplaceConf {
    /** Parse the `index.replace.regexp` property: one instruction per
      * line; `hostmatch=`/`urlmatch=` lines open a new match set (the
      * parse starts in a match-everything host set), other lines are
      * `field[:toField]=/regexp/replacement/[flags]` with the
      * value's first char as the delimiter and an optional integer
      * Pattern-flags tail (parseConf, ReplaceIndexer.java:128-230). */
    def parse(prop: String): ReplaceConf = {
      val byHost = scala.collection.mutable.LinkedHashMap
        .empty[String, Vector[FieldReplacer]]
      val byUrl = scala.collection.mutable.LinkedHashMap
        .empty[String, Vector[FieldReplacer]]
      var hostPattern = ".*"
      var urlPattern: Option[String] = None
      prop.linesIterator.map(_.trim).filter(_.nonEmpty).foreach { line =>
        val eq = line.indexOf('=')
        if (eq > 0) {
          val name = line.substring(0, eq).trim
          val value = line.substring(eq + 1)
          name match {
            case "hostmatch" =>
              urlPattern = None; hostPattern = value.trim
            case "urlmatch" =>
              urlPattern = Some(value.trim)
            case _ =>
              parseInstruction(name, value).foreach { fr =>
                urlPattern match {
                  case Some(up) =>
                    byUrl(up) = byUrl.getOrElse(up, Vector.empty) :+ fr
                  case None =>
                    byHost(hostPattern) =
                      byHost.getOrElse(hostPattern, Vector.empty) :+ fr
                }
              }
          }
        }
      }
      def compiled(m: scala.collection.mutable.LinkedHashMap[String,
          Vector[FieldReplacer]]): Seq[(Pattern, Seq[FieldReplacer])] =
        m.toSeq.flatMap { case (p, frs) =>
          try Some(Pattern.compile(p) -> (frs: Seq[FieldReplacer]))
          catch { case _: java.util.regex.PatternSyntaxException => None }
        }
      ReplaceConf(compiled(byHost), compiled(byUrl))
    }

    private def parseInstruction(name: String, value: String)
        : Option[FieldReplacer] = {
      val (field, toField) = name.split(":", 2) match {
        case Array(f, t) => (f.trim, t.trim)
        case _ => (name, name)
      }
      val v = value.trim
      if (v.length < 2) return None
      val sep = v.charAt(0)
      val parts = v.substring(1).split(Pattern.quote(sep.toString), -1)
      if (parts.length < 2) return None
      val (regex, replacement) = (parts(0), parts(1))
      val flags =
        if (parts.length > 2 && parts(2).nonEmpty)
          scala.util.Try(parts(2).trim.toInt).toOption.getOrElse(0)
        else 0
      try Some(FieldReplacer(field, toField,
        Pattern.compile(regex, flags), replacement))
      catch { case _: java.util.regex.PatternSyntaxException => None }
    }
  }

  /** Registry-pluggable form of index-replace. */
  final class ReplaceIndexingFilter(conf: ReplaceConf)
      extends IndexingFilter {
    def filter(doc: Map[String, String], url: String,
        datum: CrawlDatum): Option[Map[String, String]] =
      Some(conf(doc))
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
