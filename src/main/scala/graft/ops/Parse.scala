package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.net.UrlFilter
import graft.functions.Urls
import graft.schemas._

/** X8 + F7 — HTML parse and the crawl_parse emission
  * (parse-html HtmlParser.java / DOMContentUtils.java semantics over
  * the hand-rolled tokenizer+tree in [[Html]] — title, visible text,
  * resolved outlinks, base-href; ParseSegment.java:87-145 gate;
  * ParseOutputFormat.java:221-260 SIGNATURE/LINKED/PARSE_META
  * emission).
  */
object Parse {

  /** scoring-metadata (MetadataScoringFilter.java:56-125): three
    * propagation hops, each a configured key list — datum metadata →
    * content metadata (`scoring.db.md`, passScoreBeforeParsing), content
    * metadata → parse metadata (`scoring.content.md`,
    * passScoreAfterParsing), parse metadata → every outlink's datum
    * (`scoring.parse.md`, distributeScoreToOutlinks). The LINKED datums
    * carry the keys through updatedb into the next round's crawldb. */
  final case class ScoringMetadata(
      datumMd: Seq[String] = Nil, // scoring.db.md
      contentMd: Seq[String] = Nil, // scoring.content.md
      parseMd: Seq[String] = Nil) // scoring.parse.md

  final case class Config(
      maxOutlinksPerPage: Int = 100, // db.max.outlinks.per.page
      maxAnchorLength: Int = 100, // linkdb.max.anchor.length
      interval: Int = 2592000,
      deleteFailed: Boolean = false, // parser.delete.failed (NUTCH-1732)
      ignoreExternalLinks: Boolean = false, // db.ignore.external.links
      scoringMetadata: ScoringMetadata = ScoringMetadata(),
      // parsefilter-debug (DebugParseFilter.java:46-54): serialize the
      // parsed DOM into parse_meta("DOM") — costs a second parse of the
      // page, so strictly a diagnostic switch
      debugDom: Boolean = false,
      // file:/ftp: outlinks are OPT-IN, mirroring the reference's
      // default regex-urlfilter.txt `-^(file|ftp|mailto)` posture: a
      // deployment that composes FileProtocol with an empty filter
      // chain must not be steerable by hostile remote HTML into
      // crawling executor-local files
      followFileSchemes: Boolean = false,
      // tika.extractor ("none" | "boilerpipe"): with "boilerpipe" the
      // HTML text field carries the WSDM'10 main-content extraction
      // ([[Boilerplate]]) instead of the full DOM text — the
      // reference's configuration surface, first-party
      extractor: String = "none")

  /** One page's parse: title, cleaned text, resolved outlinks. Returns
    * Failed status when the content is not parseable as text.
    *
    * Bytes go through X5 first: gzip/deflate payloads are decompressed
    * and the charset detected (BOM > header > meta > UTF-8 check >
    * windows-1252) instead of assuming UTF-8 — functions/Encoding,
    * after EncodingDetector.java / GZIPUtils.java. The decoded HTML
    * then goes through the real tokenizer ([[Html.parse]]): script/
    * style content never leaks into text, comments and CDATA are
    * skipped, unquoted attributes parse, and a `<base href>` in HEAD
    * re-roots relative links (HtmlParser.java base handling).
    *
    * Pipeline policy on top of the DOM-faithful [[Html.getOutlinks]]:
    * keep http(s) targets only, dedup by URL keeping the first anchor,
    * cap count and anchor length (ParseOutputFormat.java:221-260). */
  def parsePage(base: String, bytes: Array[Byte], contentType: String,
      cfg: Config): (Int, String, String, Seq[Outlink]) = {
    if (bytes != null && bytes.nonEmpty && contentType.startsWith("image/")) {
      // images parse successfully with no text; their width/height land
      // in parseMeta downstream (TestImageMetadata semantics — the
      // reference gets them from Tika's image parser, here from the
      // first-party header decode)
      return (if (graft.operators.Multimodal.imageDims(bytes).isDefined)
        ParseStatusCodes.Success
      else ParseStatusCodes.Failed, "", "", Nil)
    }
    if (bytes != null && bytes.nonEmpty &&
      (contentType == "application/rtf" || contentType == "text/rtf")) {
      val r = Rtf.parse(bytes)
      return (if (r.ok) ParseStatusCodes.Success else ParseStatusCodes.Failed,
        r.title, r.text, Nil)
    }
    if (bytes != null && bytes.nonEmpty &&
      contentType == "application/epub+zip") {
      return OfficeDocs.extractEpub(bytes) match {
        case Some(text) => (ParseStatusCodes.Success, "", text, Nil)
        case None => (ParseStatusCodes.Failed, "", "", Nil)
      }
    }
    if (bytes != null && bytes.nonEmpty &&
      (contentType.startsWith("application/vnd.oasis.opendocument") ||
        contentType.startsWith("application/vnd.openxmlformats-officedocument") ||
        contentType.startsWith("application/vnd.sun.xml"))) {
      // the DECLARED type picks the extractor (a zip member named
      // *.docx routes here even when the container itself carries no
      // [Content_Types].xml to sniff)
      val extracted =
        if (contentType.endsWith("wordprocessingml.document"))
          OfficeDocs.extractDocx(bytes)
        else if (contentType.endsWith("spreadsheetml.sheet"))
          OfficeDocs.extractXlsx(bytes)
        else OfficeDocs.extractOdf(bytes)
      return extracted match {
        case Some(text) => (ParseStatusCodes.Success, "", text, Nil)
        case None => (ParseStatusCodes.Failed, "", "", Nil)
      }
    }
    if (bytes != null && bytes.nonEmpty &&
      (contentType == "application/msword" ||
        contentType == "application/vnd.ms-excel" ||
        contentType == "application/vnd.ms-powerpoint" ||
        contentType == "application/x-ole-storage")) {
      // OLE2 compound files: a declared type goes straight to its
      // extractor; a sniffed container tries Word, then the BIFF8
      // workbook, then the PowerPoint record tree
      val text = contentType match {
        case "application/vnd.ms-excel" => XlsDoc.extract(bytes)
        case "application/vnd.ms-powerpoint" => PptDoc.extract(bytes)
        case "application/msword" => WordDoc.extract(bytes).map(_.text)
        case _ => WordDoc.extract(bytes).map(_.text)
          .orElse(XlsDoc.extract(bytes))
          .orElse(PptDoc.extract(bytes))
      }
      return text match {
        case Some(t) => (ParseStatusCodes.Success, "", t, Nil)
        case None => (ParseStatusCodes.Failed, "", "", Nil)
      }
    }
    if (bytes != null && bytes.nonEmpty && contentType == "application/pdf") {
      // parse-tika's biggest single format, first-party (PdfParse):
      // text extraction incl. RC4-standard-handler decryption; an
      // unopenable (AES/passworded/malformed) PDF fails the parse
      // instead of emitting garbage
      val r = PdfParse.extract(bytes)
      return (if (r.ok) ParseStatusCodes.Success else ParseStatusCodes.Failed,
        "", r.text, Nil)
    }
    if (bytes == null || bytes.isEmpty ||
        !(contentType.startsWith("text/") || contentType.isEmpty))
      return (ParseStatusCodes.Failed, "", "", Nil)
    val html = graft.functions.Encoding.decode(bytes, contentType)
    val root = Html.parse(html)
    val baseUrl = Html.getBase(root)
      .flatMap(h => Html.resolveUrl(base, h))
      .getOrElse(base)
    val title = Html.getTitle(root)
    val text =
      if (cfg.extractor == "boilerpipe") Boilerplate.mainContent(html)
      else Html.getText(root)
    val links = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // streaming walk: stop as soon as the cap is full — a link-farm
    // page never pays text-walk + resolution beyond maxOutlinksPerPage
    Html.foreachOutlink(baseUrl, root) { o =>
      val u = o.toUrl
      // the crawlable scheme set (reference protocol plugins: lib-http,
      // protocol-file, protocol-ftp); mailto/javascript/data stay out,
      // and file:/ftp: only when the deployment opted in (see Config)
      if ((u.startsWith("http://") || u.startsWith("https://") ||
          (cfg.followFileSchemes &&
            (u.startsWith("file://") || u.startsWith("ftp://")))) &&
          !links.contains(u))
        links += u -> o.anchor.take(cfg.maxAnchorLength)
      links.size < cfg.maxOutlinksPerPage
    }
    (ParseStatusCodes.Success, title, text,
      links.map { case (u, a) => Outlink(u, a) }.toSeq)
  }

  final case class ParseOutput(parseData: Dataset[ParseDataRow],
      parseText: Dataset[ParseTextRow], crawlParse: Dataset[CrawlRow])

  /** Parse a fetched segment. The gate (ParseSegment.java:87-145): only
    * successfully fetched content is parsed. crawl_parse carries, per
    * page: a SIGNATURE datum (md5 of parse text — TextMD5Signature
    * analog), one LINKED datum per kept outlink with the OPIC score
    * share score/numOutlinks (OPICScoringFilter.distributeScoreToOutlinks),
    * and a PARSE_META datum; parse failures emit a PARSE_FAILED transient
    * when deleteFailed is on (NUTCH-1732). */
  def apply(fetch: Dataset[CrawlRow], content: Dataset[ContentRow],
      cfg: Config, outlinkFilter: UrlFilter,
      // outlink-scope normalizer (URLNormalizers.SCOPE_OUTLINK); default
      // = the basic chain, callers pass registry.normalize(_, Outlink)
      normalizer: String => Option[String] = Urls.normalize,
      // URLExemptionFilter chain (urlfilter-ignoreexempt): consulted
      // ONLY when ignoreExternalLinks drops a cross-host outlink
      // (ParseOutputFormat.filterNormalize exemption check)
      exemption: graft.plugins.Extensions.ExemptionFilter =
        graft.plugins.NoExemptions,
      // Publisher seam: a REPORT event per successfully parsed page
      // (FetcherThread.java:853 — title/content-type/score/fetch-time
      // plus the kept outlink targets)
      publisher: Option[graft.plugins.Publishers.Factory] = None)
      : ParseOutput = {
    val spark: SparkSession = fetch.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      (cfg, outlinkFilter, normalizer, exemption, publisher))

    val success = fetch
      .filter(_.datum.status == CrawlStatus.FETCH_SUCCESS)
      .map(r => (r.url, r.datum.score, r.datum.fetchTime, r.datum.metadata))
      .toDF("url", "score", "fetch_time", "datum_meta")
    val joined = content.join(success, "url")
      .select("url", "base", "bytes", "contentType", "meta", "score",
        "fetch_time", "datum_meta")
      .as[(String, String, Array[Byte], String, Map[String, String], Float,
        Long, Map[String, String])]

    val parsed = joined.mapPartitions { rows =>
      val (cfg0, filt, norm, exempt, pubF) = bc.value
      val pub = pubF.map(_())
      val out = rows.map { case (url, base, bytes, ct, cMeta, score, ft, dMeta) =>
      val (st, title, text, out0) = parsePage(base, bytes, ct, cfg0)
      val fromHost = graft.net.UrlParts.host(url)
      val outlinks = out0.flatMap(o =>
        norm(o.toUrl).flatMap(filt.filter)
          .filter(u => !cfg0.ignoreExternalLinks ||
            graft.net.UrlParts.host(u) == fromHost ||
            exempt.isExempted(url, u))
          .map(u => Outlink(u, o.anchor)))
      // scoring-metadata hop 1+2: datum → content (passScoreBeforeParsing),
      // then content → parse (passScoreAfterParsing) — each key list only
      // copies keys actually present at its source
      val sm = cfg0.scoringMetadata
      val contentMeta = sm.datumMd.foldLeft(cMeta)((m, k) =>
        dMeta.get(k).fold(m)(v => m + (k -> v)))
      val fromContent = sm.contentMd.flatMap(k =>
        contentMeta.get(k).map(k -> _)).toMap
      val domMeta =
        if (cfg0.debugDom && st == ParseStatusCodes.Success)
          Map("DOM" -> Html.renderDom(Html.parse(
            graft.functions.Encoding.decode(bytes, ct))))
        else Map.empty[String, String]
      // image payloads carry their dimensions as parse metadata
      // (TestImageMetadata: width/height from the header decode)
      val imgMeta =
        if (st == ParseStatusCodes.Success && ct.startsWith("image/"))
          graft.operators.Multimodal.imageDims(bytes)
            .map { case (w, h) =>
              Map("width" -> w.toString, "height" -> h.toString)
            }.getOrElse(Map.empty[String, String])
        else Map.empty[String, String]
      val parseMeta = Map("parser" -> "html") ++ fromContent ++ domMeta ++
        imgMeta
      if (st == ParseStatusCodes.Success)
        pub.foreach(_.publish(graft.plugins.Publishers.FetchEvent(
          graft.plugins.Publishers.EventType.Report, url, ft, Map(
            "title" -> title,
            "contentType" -> ct,
            "score" -> score.toString,
            "fetchTime" -> ft.toString,
            "outlinks" -> outlinks.map(_.toUrl).mkString(" ")))))
      (url, st, title, text, outlinks, score, parseMeta)
      }
      pub.fold(out)(p => graft.plugins.Publishers.closing(out, p))
    }.cache()

    val parseData = parsed.map { case (url, st, title, _, outlinks, _, pm) =>
      ParseDataRow(url, title, outlinks, st, pm)
    }
    val parseText = parsed.map { case (url, _, _, text, _, _, _) =>
      ParseTextRow(url, text)
    }
    val crawlParse = parsed.flatMap {
      case (url, st, title, text, outlinks, score, pMeta) =>
        val (cfg0, _, _, _, _) = bc.value
        if (st == ParseStatusCodes.Success) {
          val sig = CrawlRow(url, CrawlDatum(CrawlStatus.SIGNATURE, 0L, 0, 0,
            0f, Some(graft.functions.TextAnalysis.md5Hex(text)), 0L, Map.empty))
          // scoring-metadata hop 3 (distributeScoreToOutlinks): configured
          // parse-meta keys ride every LINKED datum to the next round
          val outMd = cfg0.scoringMetadata.parseMd.flatMap(k =>
            pMeta.get(k).map(k -> _)).toMap
          val share = if (outlinks.nonEmpty) score / outlinks.size else 0f
          val linked = outlinks.map(o => CrawlRow(o.toUrl,
            CrawlDatum(CrawlStatus.LINKED, 0L, 0, cfg0.interval, share, None,
              0L, outMd)))
          val pm = CrawlRow(url, CrawlDatum(CrawlStatus.PARSE_META, 0L, 0, 0,
            0f, None, 0L,
            Map("parse.title.present" -> (title.nonEmpty).toString)))
          Seq(sig, pm) ++ linked
        } else if (cfg0.deleteFailed) {
          Seq(CrawlRow(url, CrawlDatum(CrawlStatus.PARSE_FAILED, 0L, 0, 0, 0f,
            None, 0L, Map.empty)))
        } else Nil
    }
    ParseOutput(parseData, parseText, crawlParse)
  }
}
