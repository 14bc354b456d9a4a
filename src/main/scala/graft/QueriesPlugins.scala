package graft

import org.apache.spark.sql.functions._

import Queries.t
import graft.ops.{Feed, Html}
import graft.plugins.Subcollections

/** Batch 6 — parse/indexing plugin analogs wired as oracle-checked
  * queries: RSS/Atom feed parsing (parse-feed), subcollection tagging
  * (subcollection), heading extraction (headings), and Creative-Commons
  * license discovery (creativecommons).
  *
  * Oracle strategy: the inputs are synthesized CLOSED-FORM from doc_id
  * (feeds/pages with entities, CDATA, nesting, tier conflicts), the
  * engine side runs the REAL hand-rolled parsers (Feed.parseFeed /
  * Html.parse) through a UDF, and the oracle states the expected output
  * directly as SQL arithmetic — so a hash match proves the parser
  * reproduces the closed form, a stronger check than running the same
  * regex on both sides. The UDF stages are map-only (no shuffle); at
  * 100 TB each is one pass over the content column, exactly how the
  * reference runs its parse filters per fetched page.
  */
object QueriesPlugins {

  // 2024-01-06 is a Saturday; varying only the time keeps the weekday
  // token of the synthesized pubDate valid under strict RFC-1123 parse.
  private val Jan6_2024Utc = 1704499200L

  private val parseFeedUdf =
    udf((xml: String) => Feed.parseFeed(xml).map(i =>
      (i.url, i.title, i.author, i.publishedMs, i.text, i.feedTitle)))

  /** parse-feed (FeedParser.java): one sub-document per feed item keyed
    * by the item link, text = title + description. The synthesized RSS
    * exercises entity decode in titles, CDATA descriptions (no entity
    * decode inside), dc:creator vs author precedence, RFC-822 pubDate
    * parsing, and the linkless-item drop. */
  val feedParse = Q(
    "feed_parse",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val hh = lpad((col("doc_id") % 24).cast("string"), 2, "0")
      val mm = lpad((col("doc_id") % 60).cast("string"), 2, "0")
      val ss = lpad(((col("doc_id") * 7) % 60).cast("string"), 2, "0")
      val rss = concat(
        lit("<?xml version=\"1.0\"?><rss version=\"2.0\"><channel>" +
          "<title>Feed &amp; Channel "), col("doc_id"),
        lit("</title><link>http://feeds.example.com/"), col("doc_id"),
        lit("</link><item><title>Item One &amp; more "), col("doc_id"),
        lit("</title><link>http://feeds.example.com/"), col("doc_id"),
        lit("/a</link><description><![CDATA[Body <b>"), col("doc_id"),
        lit("</b>]]></description><author>alice@example.com</author>" +
          "<pubDate>Sat, 06 Jan 2024 "),
        hh, lit(":"), mm, lit(":"), ss,
        lit(" GMT</pubDate></item><item><title>Item Two "), col("doc_id"),
        lit("</title><link>http://feeds.example.com/"), col("doc_id"),
        lit("/b</link><description>Plain &lt;body&gt; "), col("doc_id"),
        lit("</description><dc:creator>bob</dc:creator></item>" +
          "<item><title>NoLink</title></item></channel></rss>"))
      d.select(col("doc_id"), explode(parseFeedUdf(rss)).as("item"))
        .select(col("doc_id"),
          col("item._1").as("url"),
          col("item._2").as("title"),
          col("item._3").as("author"),
          col("item._4").as("published_ms"),
          col("item._5").as("text"),
          col("item._6").as("feed_title"))
    },
    Some(s"""
      SELECT doc_id,
        'http://feeds.example.com/' || doc_id || '/a' AS url,
        'Item One & more ' || doc_id AS title,
        'alice@example.com' AS author,
        CAST(($Jan6_2024Utc + (doc_id % 24) * 3600 + (doc_id % 60) * 60
              + (doc_id * 7) % 60) * 1000 AS BIGINT) AS published_ms,
        'Item One & more ' || doc_id || ' Body <b>' || doc_id || '</b>'
          AS text,
        'Feed & Channel ' || doc_id AS feed_title
      FROM documents
      UNION ALL
      SELECT doc_id,
        'http://feeds.example.com/' || doc_id || '/b' AS url,
        'Item Two ' || doc_id AS title,
        'bob' AS author,
        CAST(NULL AS BIGINT) AS published_ms,
        'Item Two ' || doc_id || ' Plain <body> ' || doc_id AS text,
        'Feed & Channel ' || doc_id AS feed_title
      FROM documents"""))

  // Registration-order collections; "news" blacklists its archive, the
  // case-insensitive "shop" matches mixed-case carts.
  private val colls = Seq(
    Subcollections.Subcollection("news", "News",
      Seq("/news/"), Seq("/news/archive")),
    Subcollections.Subcollection("docs", "Docs", Seq("/docs/"), Nil),
    Subcollections.Subcollection("shop", "Shop",
      Seq("/cart/", ".shop.example"), Seq("/cart/empty"),
      caseInsensitive = true))

  /** subcollection (Subcollection.filter + SubcollectionIndexingFilter):
    * blacklist-first substring matching per collection, matching ids
    * comma-joined in registration order into the document's
    * `subcollection` field ('' when none). */
  val subcollectionTag = Q(
    "subcollection_tag",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val url = concat(lit("http://w"), col("c_custkey") % 20,
        when(col("c_custkey") % 7 === 0, lit(".shop.Example.com"))
          .otherwise(lit(".example.com")),
        when(col("c_custkey") % 5 === 0,
          concat(lit("/news/story"), col("c_custkey")))
          .when(col("c_custkey") % 5 === 1,
            concat(lit("/news/archive/"), col("c_custkey")))
          .when(col("c_custkey") % 5 === 2,
            concat(lit("/docs/page"), col("c_custkey")))
          .when(col("c_custkey") % 5 === 3,
            concat(lit("/Cart/"), col("c_custkey")))
          .otherwise(concat(lit("/x/"), col("c_custkey"))))
      c.select(col("c_custkey").as("id"), url.as("url"))
        .select(col("id"), col("url"),
          Subcollections.tagCol(col("url"), colls).as("collections"))
    },
    Some("""
      WITH u AS (
        SELECT c_custkey AS id,
          'http://w' || (c_custkey % 20)
          || CASE WHEN c_custkey % 7 = 0 THEN '.shop.Example.com'
                  ELSE '.example.com' END
          || CASE WHEN c_custkey % 5 = 0 THEN '/news/story' || c_custkey
                  WHEN c_custkey % 5 = 1 THEN '/news/archive/' || c_custkey
                  WHEN c_custkey % 5 = 2 THEN '/docs/page' || c_custkey
                  WHEN c_custkey % 5 = 3 THEN '/Cart/' || c_custkey
                  ELSE '/x/' || c_custkey END AS url
        FROM customer)
      SELECT id, url,
        concat_ws(',',
          CASE WHEN url NOT LIKE '%/news/archive%'
                AND url LIKE '%/news/%' THEN 'news' END,
          CASE WHEN url LIKE '%/docs/%' THEN 'docs' END,
          CASE WHEN lower(url) NOT LIKE '%/cart/empty%'
                AND (lower(url) LIKE '%/cart/%'
                     OR lower(url) LIKE '%.shop.example%') THEN 'shop' END)
          AS collections
      FROM u"""))

  private val headingsUdf = udf((html: String) => {
    val root = Html.parse(html)
    (Html.getHeadings(root, "h1"), Html.getHeadings(root, "h2"))
  })

  /** headings (HeadingsParseFilter): heading texts in document order with
    * getText collapse — nested inline markup flattened, whitespace
    * collapsed, empty headings dropped. First h1 is the single-valued
    * field; h2s joined as the multivalued form. */
  val headingsExtract = Q(
    "headings_extract",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val html = concat(
        lit("<html><body><h1>Main &amp; "), col("doc_id"),
        lit("</h1><p>x</p><h2>  First\t"), col("doc_id"),
        lit(" </h2><h2><b>Second</b> "), col("doc_id"),
        lit("</h2><h2>   </h2>"),
        when(col("doc_id") % 4 === 0, lit("<h1>Extra</h1>"))
          .otherwise(lit("")),
        lit("</body></html>"))
      d.select(col("doc_id"), headingsUdf(html).as("h"))
        .select(col("doc_id"),
          col("h._1").getItem(0).as("h1"),
          size(col("h._1")).cast("long").as("n_h1"),
          concat_ws("|", col("h._2")).as("h2_all"))
    },
    Some("""
      SELECT doc_id,
        'Main & ' || doc_id AS h1,
        CAST(CASE WHEN doc_id % 4 = 0 THEN 2 ELSE 1 END AS BIGINT) AS n_h1,
        'First ' || doc_id || '|Second ' || doc_id AS h2_all
      FROM documents"""))

  private val licenseUdf = udf((html: String) =>
    Html.getLicense(Html.parse(html)))

  /** creativecommons (CCParseFilter.Walker): license URL discovery with
    * the reference's tier order — rdf-in-comment beats rel="license"
    * beats a bare creativecommons.org/licenses anchor. doc_id % 6 == 1
    * pages carry BOTH a rel link and a bare anchor, proving rel wins. */
  val ccLicense = Q(
    "cc_license",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val rdf = lit("<!-- <rdf:RDF xmlns:cc=\"http://web.resource.org/cc/\">" +
        "<cc:license rdf:resource=\"http://creativecommons.org/licenses/by/4.0/\"/>" +
        "</rdf:RDF> -->")
      val rel = lit("<a rel=\"license\" " +
        "href=\"http://creativecommons.org/licenses/by-sa/4.0/\">license</a>")
      val bare = lit("<a " +
        "href=\"http://creativecommons.org/licenses/by-nc/4.0/\">cc</a>")
      val html = concat(lit("<html><head>"),
        when(col("doc_id") % 3 === 0, rdf).otherwise(lit("")),
        lit("</head><body><p>page "), col("doc_id"), lit("</p>"),
        when(col("doc_id") % 3 === 1, rel).otherwise(lit("")),
        when(col("doc_id") % 3 === 2 || col("doc_id") % 6 === 1, bare)
          .otherwise(lit("")),
        lit("</body></html>"))
      d.select(col("doc_id"), licenseUdf(html).as("lic"))
        .select(col("doc_id"),
          col("lic._1").as("license_url"),
          col("lic._2").as("license_loc"))
    },
    Some("""
      SELECT doc_id,
        CASE WHEN doc_id % 3 = 0
               THEN 'http://creativecommons.org/licenses/by/4.0/'
             WHEN doc_id % 3 = 1
               THEN 'http://creativecommons.org/licenses/by-sa/4.0/'
             ELSE 'http://creativecommons.org/licenses/by-nc/4.0/' END
          AS license_url,
        CASE WHEN doc_id % 3 = 0 THEN 'rdf'
             WHEN doc_id % 3 = 1 THEN 'rel'
             ELSE 'a' END AS license_loc
      FROM documents"""))

  // Multi-engine normalizer chain, built once on the driver and closed
  // over by the UDF (rules broadcast with the task closure — no
  // per-executor file reads). Engine order mirrors a typical reference
  // `urlnormalizer.order`: regex, querystring, slash, ajax, host,
  // protocol.
  private lazy val normalizerChain: Seq[graft.plugins.Extensions.UrlNormalizer] = {
    import graft.plugins.Normalizers._
    Seq(
      new RegexUrlNormalizer(RegexUrlNormalizer.parseRules(
        """<regex-normalize><regex>
          |<pattern>(?i)(;?\b_?(l|j|bv_)?(sid|phpsessid|sessionid)=.*?)(\?|&amp;|#|$)</pattern>
          |<substitution>$4</substitution>
          |</regex></regex-normalize>""".stripMargin)),
      new QuerystringUrlNormalizer,
      new SlashUrlNormalizer(Map(
        "slashadd.example.com" -> true, "slashrem.example.com" -> false)),
      new AjaxUrlNormalizer,
      new HostUrlNormalizer(Map("*.hosts.example.com" -> "www.example.com")),
      new ProtocolUrlNormalizer(Map("secure.example.com" -> "https"),
        Map.empty))
  }

  private lazy val normalizeChainUdf = {
    val chain = normalizerChain
    udf((url: String) => chain.foldLeft(Option(url))((u, n) =>
      u.flatMap(n.normalize(_, graft.plugins.Extensions.Scope.Crawldb))).orNull)
  }

  /** F1 (full) — the URL-normalizer ENGINE FAMILY run as one chain:
    * regex (session-id strip, RegexURLNormalizer.java:332), querystring
    * sort (QuerystringURLNormalizer.java:85), per-host trailing-slash
    * policy both directions (SlashURLNormalizer.java:211), #!-AJAX
    * rewrite (AjaxURLNormalizer.java:239), wildcard host remap
    * (HostURLNormalizer.java:140), and scheme forcing
    * (ProtocolURLNormalizer.java:204). Seven URL classes each exercise
    * one engine; the oracle states the expected rewrite closed-form, so
    * a hash match proves every engine's semantics, not just one. */
  val urlNormalizeChain = Q(
    "url_normalize_chain",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val k = col("c_custkey")
      val cls = (k % 7).cast("int")
      val url =
        when(cls === 0, concat(lit("http://regex.example.com/foo.php;jsessionid=A"),
          k, lit("?f="), k))
        .when(cls === 1, concat(lit("http://qs.example.com/p?c="), k,
          lit("&a=1&b="), k))
        .when(cls === 2, concat(lit("http://slashadd.example.com/page"), k))
        .when(cls === 3, concat(lit("http://slashrem.example.com/a/b"), k,
          lit("/")))
        .when(cls === 4, concat(lit("http://s"), k % 3,
          lit(".hosts.example.com/x"), k))
        .when(cls === 5, concat(lit("http://secure.example.com/p"), k))
        .otherwise(concat(lit("http://ajax.example.com/p"), k,
          lit("#!key="), k))
      c.select(k.as("id"), url.as("url"))
        .select(col("id"), col("url"),
          normalizeChainUdf(col("url")).as("normalized"))
    },
    Some("""
      WITH u AS (
        SELECT c_custkey AS id, (c_custkey % 7)::INT AS cls,
          CASE (c_custkey % 7)::INT
            WHEN 0 THEN 'http://regex.example.com/foo.php;jsessionid=A'
                        || c_custkey || '?f=' || c_custkey
            WHEN 1 THEN 'http://qs.example.com/p?c=' || c_custkey
                        || '&a=1&b=' || c_custkey
            WHEN 2 THEN 'http://slashadd.example.com/page' || c_custkey
            WHEN 3 THEN 'http://slashrem.example.com/a/b' || c_custkey || '/'
            WHEN 4 THEN 'http://s' || (c_custkey % 3)
                        || '.hosts.example.com/x' || c_custkey
            WHEN 5 THEN 'http://secure.example.com/p' || c_custkey
            ELSE 'http://ajax.example.com/p' || c_custkey
                 || '#!key=' || c_custkey END AS url
        FROM customer)
      SELECT id, url,
        CASE cls
          WHEN 0 THEN 'http://regex.example.com/foo.php?f=' || id
          WHEN 1 THEN 'http://qs.example.com/p?a=1&b=' || id || '&c=' || id
          WHEN 2 THEN 'http://slashadd.example.com/page' || id || '/'
          WHEN 3 THEN 'http://slashrem.example.com/a/b' || id
          WHEN 4 THEN 'http://www.example.com/x' || id
          WHEN 5 THEN 'https://secure.example.com/p' || id
          ELSE 'http://ajax.example.com/p' || id
               || '?_escaped_fragment_=key=' || id END AS normalized
      FROM u"""))

  private val enrichUdf = udf((anchors: Seq[String], contentType: String,
      lastModified: String, modifiedMs: Long, fetchMs: Long,
      disposition: String, title: String, html: String) => {
    import graft.plugins.IndexingFilters._
    val (lm, date) = docDate(Option(lastModified), modifiedMs, fetchMs)
    val resetTitle =
      if (title != null) title
      else dispositionFilename(disposition).orNull
    val metas = metatagEntries(graft.ops.Html.getMetaTags(
      graft.ops.Html.parse(html)))
    (dedupAnchors(anchors).mkString("|"),
      typeFields(contentType).mkString("|"),
      lm, date, resetTitle,
      metas.map { case (k, v) => s"$k=$v" }.mkString("|"))
  })

  /** Indexing-filter enrichment — index-anchor
    * (AnchorIndexingFilter.java:85-112: case-insensitive anchor dedup),
    * index-more (MoreIndexingFilter.java:112-310: last-modified/date
    * resolution incl. non-HTTP date fallback, type multivalue from the
    * content type, Content-Disposition title reset) and parse-metatags
    * (MetaTagsParser.java:97-124 over HTMLMetaProcessor's general +
    * http-equiv groups, body metas excluded). Headers/anchors/html are
    * planted closed-form per doc_id; the oracle states each filter's
    * expected contribution directly. */
  val indexEnriched = Q(
    "index_enriched",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val k = col("doc_id")
      val anchors = array(lit("Home"), lit("home"),
        concat(lit("Link"), k), lit("HOME"), concat(lit("link"), k))
      val contentType =
        when(k % 3 === 0, lit("text/HTML; charset=utf-8"))
          .when(k % 3 === 1, lit("application/pdf"))
          .otherwise(lit(null: String))
      val lastModified =
        when(k % 4 === 0, concat(lit("Sat, 06 Jan 2024 "),
          lpad((k % 24).cast("string"), 2, "0"), lit(":00:07 GMT")))
          .when(k % 4 === 1, lit("2024/01/06"))
          .when(k % 4 === 2, lit("not a date"))
          .otherwise(lit(null: String))
      val modifiedMs = when(k % 2 === 0, lit(1700000000000L) + k * 1000)
        .otherwise(lit(0L))
      val fetchMs = lit(1710000000000L) + k * 1000
      val disposition = when(k % 5 === 0,
        concat(lit("inline; filename=\"report"), k, lit(".pdf\"")))
        .otherwise(lit(null: String))
      val title = when(k % 5 <= 1, lit(null: String))
        .otherwise(concat(lit("T"), k))
      val html = concat(
        lit("<html><head><meta name=\"Keywords\" content=\"kw"), k,
        lit(",alpha\"><meta http-equiv=\"Content-Type\" " +
          "content=\"text/html\"><meta name=\"description\" content=\"d"), k,
        lit("\"></head><body><meta name=\"inbody\" content=\"x\">" +
          "</body></html>"))
      d.select(k.as("doc_id"),
          enrichUdf(anchors, contentType, lastModified, modifiedMs, fetchMs,
            disposition, title, html).as("e"))
        .select(col("doc_id"),
          col("e._1").as("anchors"),
          col("e._2").as("type_fields"),
          col("e._3").as("last_modified_ms"),
          col("e._4").as("date_ms"),
          col("e._5").as("title"),
          col("e._6").as("metatags"))
    },
    Some("""
      SELECT doc_id,
        'Home|Link' || doc_id AS anchors,
        CASE WHEN doc_id % 3 = 0 THEN 'text/html|text|html'
             WHEN doc_id % 3 = 1 THEN 'application/pdf|application|pdf'
             ELSE '' END AS type_fields,
        CASE WHEN doc_id % 4 = 0
               THEN CAST(1704499207000 + (doc_id % 24) * 3600000 AS BIGINT)
             WHEN doc_id % 4 = 1 THEN CAST(1704499200000 AS BIGINT)
             ELSE CAST(NULL AS BIGINT) END AS last_modified_ms,
        CASE WHEN doc_id % 4 = 0
               THEN CAST(1704499207000 + (doc_id % 24) * 3600000 AS BIGINT)
             WHEN doc_id % 4 = 1 THEN CAST(1704499200000 AS BIGINT)
             WHEN doc_id % 2 = 0 THEN CAST(1700000000000 + doc_id * 1000 AS BIGINT)
             ELSE CAST(1710000000000 + doc_id * 1000 AS BIGINT) END AS date_ms,
        CASE WHEN doc_id % 5 = 0 THEN 'report' || doc_id || '.pdf'
             WHEN doc_id % 5 = 1 THEN NULL
             ELSE 'T' || doc_id END AS title,
        'metatag.keywords=kw' || doc_id
          || ',alpha|metatag.description=d' || doc_id
          || '|metatag.content-type=text/html' AS metatags
      FROM documents"""))

  private val zipParseUdf = udf((k: Long, truncated: Boolean) => {
    import graft.ops.ZipParse
    val html = (s"""<html><body>Zip body $k """ +
      s"""<a href="http://x.example.com/l$k">L$k</a></body></html>""")
      .getBytes("UTF-8")
    val inner = ZipParse.build(Seq(s"c$k.txt" -> s"inner c$k".getBytes("UTF-8")))
    val bytes = ZipParse.build(Seq(
      s"a$k.html" -> html,
      "notes/" -> Array.empty[Byte],
      s"notes/b$k.txt" -> s"plain b$k".getBytes("UTF-8"),
      "README" -> "no extension".getBytes("UTF-8"),
      "inner.zip" -> inner))
    // the truncation case declares one byte more than the payload has
    val declared = Some(bytes.length.toLong + (if (truncated) 1 else 0))
    val r = ZipParse.parse(s"http://files.example.com/z$k.zip", bytes,
      declaredLength = declared)
    (r.status, r.nMembers, r.text, r.outlinks.map(_.toUrl).mkString("|"))
  })

  /** parse-zip analog (ZipParser.java:57-110, ZipTextExtractor.java:
    * 62-115): member walk through the REAL parse gate — html member
    * parsed for text+outlinks, txt member decoded, extension-less member
    * and directory skipped, nested zip expanded one level, and the
    * Content-Length truncation check failing the whole parse. Payloads
    * are plan-synthesized zips (arc_roundtrip pattern); the oracle
    * states the concatenated member text closed-form. */
  val zipParse = Q(
    "zip_parse",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val k = col("doc_id")
      d.select(k.as("doc_id"),
          zipParseUdf(k, k % 5 === 0).as("r"))
        .select(col("doc_id"),
          col("r._1").as("status"),
          col("r._2").as("n_members"),
          col("r._3").as("text"),
          col("r._4").as("outlinks"))
    },
    Some("""
      SELECT doc_id,
        CASE WHEN doc_id % 5 = 0 THEN 2 ELSE 1 END AS status,
        CASE WHEN doc_id % 5 = 0 THEN 0 ELSE 3 END AS n_members,
        CASE WHEN doc_id % 5 = 0 THEN ''
             ELSE 'a' || doc_id || '.html Zip body ' || doc_id || ' L'
               || doc_id || ' notes/b' || doc_id || '.txt plain b' || doc_id
               || ' inner.zip c' || doc_id || '.txt inner c' || doc_id END
          AS text,
        CASE WHEN doc_id % 5 = 0 THEN ''
             ELSE 'http://x.example.com/l' || doc_id END AS outlinks
      FROM documents"""))

  private val jsLinksUdf = udf((html: String, base: String) =>
    graft.ops.JsParse.htmlJsLinks(graft.ops.Html.parse(html), base)
      .map(_.toUrl).mkString("|"))

  /** parse-js analog (JSParseFilter.java:82-265): quoted URL-shaped
    * literals harvested from script bodies, on* event handlers and
    * javascript: hrefs; www.-literals get http://, relative ones resolve
    * against the page URL, &amp; unescapes, non-URL-shaped literals
    * drop. Planted closed-form per doc_id. */
  val jsOutlinks = Q(
    "js_outlinks",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val k = col("doc_id")
      val base = concat(lit("http://www.site"), k % 20,
        lit(".example.com/dir/page"), k, lit(".html"))
      val html = concat(
        lit("<html><body><script>var u = \"http://js"), k,
        lit(".example.com/a.html\"; var r = \"rel"), k,
        lit("/x.html\"; var n = \"plainword\";</script>" +
          "<div onclick=\"nav('http://click"), k,
        lit(".example.com/b.html?x=1&amp;y=2')\">d</div>"),
        when(k % 2 === 0,
          concat(lit("<a href=\"javascript:open('www.bare"), k,
            lit(".example.com/c.html')\">j</a>")))
          .otherwise(lit("")),
        lit("</body></html>"))
      d.select(k.as("doc_id"),
        jsLinksUdf(html, base).as("js_links"))
    },
    Some("""
      SELECT doc_id,
        'http://js' || doc_id || '.example.com/a.html'
          || '|http://www.site' || (doc_id % 20)
          || '.example.com/dir/rel' || doc_id || '/x.html'
          || '|http://click' || doc_id || '.example.com/b.html?x=1&y=2'
          || CASE WHEN doc_id % 2 = 0
               THEN '|http://www.bare' || doc_id || '.example.com/c.html'
               ELSE '' END AS js_links
      FROM documents"""))

  private val relTagUdf = udf((html: String) =>
    graft.plugins.ParseFilters.relTags(graft.ops.Html.parse(html))
      .mkString("|"))

  /** microformats-reltag (RelTagParser.java:61-135): rel="tag" anchors
    * → URL-decoded last path segment, deduped + sorted (TreeSet);
    * relative hrefs and rel-less/href-less anchors drop. Closed-form:
    * per doc the tag set is {alpha<k%7>, big data} — "big data" from a
    * %20-encoded segment, the duplicate and decoy anchors ignored. */
  val reltagTags = Q(
    "reltag_tags",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val k = col("doc_id")
      val html = concat(
        lit("<html><body><a href=\"http://t.example.com/tag/alpha"), k % 7,
        lit("\" rel=\"tag\">a</a>" +
          "<a href=\"http://t.example.com/tag/big%20data\" rel=\"TAG\">b</a>" +
          "<a href=\"http://t.example.com/tag/alpha"), k % 7,
        lit("\" rel=\"tag\">dup</a>" +
          "<a href=\"http://t.example.com/tag/decoy\">no rel</a>" +
          "<a href=\"/rel/tag\" rel=\"tag\">relative</a></body></html>"))
      d.select(k.as("doc_id"), relTagUdf(html).as("tags"))
    },
    Some("""
      SELECT doc_id,
        'alpha' || (doc_id % 7) || '|big data' AS tags
      FROM documents"""))

  private val regexFlagsUdf = udf((html: String, text: String) => {
    import graft.plugins.ParseFilters._
    val rules = Seq(
      RegexParseRule("hasPrice", "text",
        java.util.regex.Pattern.compile("\\$\\d+")),
      RegexParseRule("hasForm", "html",
        java.util.regex.Pattern.compile("<form\\b")))
    regexFlags(html, text, rules).map { case (f, v) => s"$f=$v" }
      .mkString(",")
  })

  /** parsefilter-regex (RegexParseFilter.java:58-90): boolean fields
    * from regex probes against raw html vs extracted text. Planted so
    * hasPrice=true iff doc_id%2=0 and hasForm=true iff doc_id%3=0. */
  val parsefilterRegex = Q(
    "parsefilter_regex",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val k = col("doc_id")
      val html = concat(lit("<html><body>"),
        when(k % 3 === 0, lit("<form action=\"/buy\">")).otherwise(lit("")),
        lit("page "), k, lit("</body></html>"))
      val text = concat(lit("item "), k,
        when(k % 2 === 0, concat(lit(" costs $"), k)).otherwise(lit("")))
      d.select(k.as("doc_id"), regexFlagsUdf(html, text).as("flags"))
    },
    Some("""
      SELECT doc_id,
        'hasPrice=' || (doc_id % 2 = 0)
          || ',hasForm=' || (doc_id % 3 = 0) AS flags
      FROM documents"""))

  private val replaceLinksUdf = udf((url: String, host: String,
      title: String, outlinks: Seq[String]) => {
    import graft.plugins.IndexingFilters._
    val conf = ReplaceConf.parse(
      "hostmatch=.*\\.example\\.com\n" +
        "title=/draft/final/\n" +
        "urlmatch=.*/special/.*\n" +
        "title:subtitle=/(.+)/[$1]/")
    val doc = conf(Map("url" -> url, "host" -> host, "title" -> title))
    val (outs, _) = linkFields(url, outlinks, Nil,
      ignoreSameHostOut = true)
    (doc.getOrElse("title", ""), doc.getOrElse("subtitle", ""),
      outs.mkString("|"))
  })

  /** index-replace (ReplaceIndexer.java:128-290) + index-links
    * (LinksIndexingFilter.java:69-160) composed: host-matched in-place
    * title rewrite, url-matched write into a NEW subtitle field, and
    * outlink fields with same-host suppression — all closed-form. */
  val indexReplaceLinks = Q(
    "index_replace_links",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val k = col("doc_id")
      val host = concat(lit("w"), k % 10, lit(".example.com"))
      val url = concat(lit("http://"), host,
        when(k % 4 === 0, lit("/special/p")).otherwise(lit("/p")), k)
      val title = concat(lit("draft doc "), k)
      val outlinks = array(
        concat(lit("http://"), host, lit("/self"), k), // same host: dropped
        concat(lit("http://out"), k % 5, lit(".example.org/x"), k))
      d.select(k.as("doc_id"),
          replaceLinksUdf(url, host, title, outlinks).as("r"))
        .select(col("doc_id"),
          col("r._1").as("title"),
          col("r._2").as("subtitle"),
          col("r._3").as("outlink_fields"))
    },
    Some("""
      SELECT doc_id,
        'final doc ' || doc_id AS title,
        CASE WHEN doc_id % 4 = 0 THEN '[final doc ' || doc_id || ']'
             ELSE '' END AS subtitle,
        'http://out' || (doc_id % 5) || '.example.org/x' || doc_id
          AS outlink_fields
      FROM documents"""))

  private val containerDetectUdf = udf((k: Long) => {
    import graft.ops.ZipParse.build
    val b = "body".getBytes("UTF-8")
    val bytes = (k % 7) match {
      case 0 => build(Seq("[Content_Types].xml" -> b,
        s"word/document$k.xml" -> b))
      case 1 => build(Seq("[Content_Types].xml" -> b,
        s"xl/workbook$k.xml" -> b))
      case 2 => build(Seq("[Content_Types].xml" -> b,
        s"ppt/presentation$k.xml" -> b))
      case 3 => build(Seq("mimetype" -> "application/epub+zip".getBytes("UTF-8"),
        s"OEBPS/content$k.opf" -> b))
      case 4 => build(Seq(
        "mimetype" ->
          "application/vnd.oasis.opendocument.text".getBytes("UTF-8"),
        s"content$k.xml" -> b))
      case 5 => build(Seq("META-INF/MANIFEST.MF" -> b, s"A$k.class" -> b))
      case _ => build(Seq(s"docs$k.txt" -> b))
    }
    graft.operators.Multimodal.sniffDeep(bytes)
  })

  /** X6 breadth — container-aware MIME detection (the Tika zip-
    * container heuristics: OOXML marker + part roots, ODF/EPUB
    * self-declaring `mimetype` first entry, jar manifest). Payloads are
    * plan-synthesized zips per doc_id (the zip_parse pattern); the
    * oracle states the expected type closed-form, so every detection
    * branch is exercised on ~1/7 of the corpus. */
  val containerDetect = Q(
    "container_detect",
    (s, dir) => {
      val d = t(s, dir, "documents")
      d.select(col("doc_id"),
        containerDetectUdf(col("doc_id")).as("detected_type"))
    },
    Some("""
      SELECT doc_id,
        CASE doc_id % 7
          WHEN 0 THEN
            'application/vnd.openxmlformats-officedocument.wordprocessingml.document'
          WHEN 1 THEN
            'application/vnd.openxmlformats-officedocument.spreadsheetml.sheet'
          WHEN 2 THEN
            'application/vnd.openxmlformats-officedocument.presentationml.presentation'
          WHEN 3 THEN 'application/epub+zip'
          WHEN 4 THEN 'application/vnd.oasis.opendocument.text'
          WHEN 5 THEN 'application/java-archive'
          ELSE 'application/zip' END AS detected_type
      FROM documents"""))

  private val pdfTextUdf = udf((id: Long, pages: Int, enc: Boolean) => {
    import graft.ops.{Parse, PdfParse}
    val pg = (1 to pages).map(p => Seq(s"Corpus document $id page $p",
      s"training shard ${id % 16} line two"))
    // every Standard-handler family the parser supports rotates through
    // the encrypted third of the corpus: V5/R6 AES-256 (2.B hash),
    // V4/R4 AESV2, V2/R3 RC4-128, V1/R3 RC4-40
    val cipher = (id % 12) match {
      case 0 => "aes256"
      case 3 => "aes128"
      case 6 => "rc4-128"
      case _ => "rc4"
    }
    // through the REAL parse gate (application/pdf dispatch), so the
    // oracle also pins the gate's routing, not just the extractor
    val (status, _, text, _) = Parse.parsePage(
      s"http://docs.example.com/d$id.pdf",
      PdfParse.build(pg, encrypt = enc, cipher = cipher),
      "application/pdf", Parse.Config())
    (status, if (enc) 1 else 0, text)
  })

  /** parse-tika PDF analog, first-party ([[graft.ops.PdfParse]]):
    * plan-synthesized REAL PDFs (Flate-compressed content streams,
    * valid xref; every third doc encrypted under the Standard security
    * handler, rotating RC4-40 / RC4-128 / AESV2-R4 / AESV3-R6 so every
    * supported cipher family sits on the oracle path) run through the
    * REAL parse gate, and the oracle restates the planted page text
    * closed-form — a hash match proves object scan ∘ (decrypt) ∘
    * inflate ∘ content-tokenize ∘ text-assembly reproduced every
    * character. Conformance on the reference's own samples (incl. its
    * TestPdfParser expectation) is PdfParseSpec. */
  val pdfText = Q(
    "pdf_text",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val k = col("doc_id")
      // CPU-dense key-derived synth+parse over a one-row-group scan:
      // numbered repartition of the bare key engages all cores (see
      // flac_stats — AQE coalesces a column-only repartition back to
      // one task at this byte size)
      d.select(k.as("doc_id"))
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"),
          pdfTextUdf(col("doc_id"), (lit(1) + col("doc_id") % 3).cast("int"),
            col("doc_id") % 3 === 0).as("r"))
        .select(col("doc_id"),
          col("r._1").as("status"),
          col("r._2").as("encrypted"),
          col("r._3").as("text"))
    },
    Some("""
      WITH p AS (
        SELECT doc_id, 1 + doc_id % 3 AS np FROM documents),
      l AS (
        SELECT doc_id, np, unnest(range(1, np + 1)) AS pg FROM p),
      t AS (
        SELECT doc_id, np,
          string_agg('Corpus document ' || doc_id || ' page ' || pg
            || chr(10) || 'training shard ' || (doc_id % 16)
            || ' line two', chr(10) ORDER BY pg) AS text
        FROM l GROUP BY doc_id, np)
      SELECT doc_id,
        CAST(1 AS INT) AS status,
        CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS INT)
          AS encrypted,
        text
      FROM t"""))

  private val officeTextUdf = udf((id: Long, fmt: Int) => {
    import graft.ops.{Parse, ZipParse}
    val (bytes, ct) = fmt match {
      case 0 => // ODF text document
        val content = ("<?xml version=\"1.0\"?><office:document-content>" +
          "<office:body><office:text>" +
          s"<text:p>Corpus doc $id line one</text:p>" +
          s"<text:p>shard ${id % 16} line two</text:p>" +
          "</office:text></office:body></office:document-content>")
        (ZipParse.build(Seq(
          "mimetype" ->
            "application/vnd.oasis.opendocument.text".getBytes("UTF-8"),
          "content.xml" -> content.getBytes("UTF-8"))),
          "application/vnd.oasis.opendocument.text")
      case 1 => // OOXML wordprocessing
        val doc = ("<?xml version=\"1.0\"?><w:document><w:body>" +
          s"<w:p><w:r><w:t>Corpus doc $id line one</w:t></w:r></w:p>" +
          s"<w:p><w:r><w:t>shard ${id % 16} line two</w:t></w:r></w:p>" +
          "</w:body></w:document>")
        (ZipParse.build(Seq(
          "[Content_Types].xml" -> "<Types/>".getBytes("UTF-8"),
          "word/document.xml" -> doc.getBytes("UTF-8"))),
          "application/vnd.openxmlformats-officedocument" +
            ".wordprocessingml.document")
      case 2 => // OOXML spreadsheet
        val wb = "<workbook><sheets>" +
          s"""<sheet name="data$id" sheetId="1"/></sheets></workbook>"""
        val sheet = "<worksheet><sheetData><row>" +
          s"""<c r="A1" t="str"><v>alpha$id</v></c>""" +
          s"""<c r="B1" t="str"><v>beta${id % 7}</v></c>""" +
          "</row></sheetData></worksheet>"
        (ZipParse.build(Seq(
          "[Content_Types].xml" -> "<Types/>".getBytes("UTF-8"),
          "xl/workbook.xml" -> wb.getBytes("UTF-8"),
          "xl/worksheets/sheet1.xml" -> sheet.getBytes("UTF-8"))),
          "application/vnd.openxmlformats-officedocument" +
            ".spreadsheetml.sheet")
      case 3 => // RTF
        (("{\\rtf1\\ansi{\\info{\\title Doc " + id + "}}" +
          "Corpus doc " + id + " body\\par line two " + (id % 16) + "}")
          .getBytes("windows-1252"), "application/rtf")
      case _ => // Word 97 binary (.doc): cp1252 piece + UTF-16 piece
        (graft.ops.WordDoc.synth(s"Corpus doc $id body one\r",
          s"unicode part ${id % 16}"), "application/msword")
    }
    val (status, title, text, _) = Parse.parsePage(
      s"http://docs.example.com/d$id", bytes, ct, Parse.Config())
    (status, title, text)
  })

  /** parse-tika office-family analog, first-party ([[graft.ops.Rtf]] +
    * [[graft.ops.OfficeDocs]] + the zip container walk): per doc_id the
    * payload cycles ODT / docx / xlsx / RTF / Word-97 .doc, each built
    * as a REAL container (zip members / RTF groups / a valid CFB
    * compound file with a two-piece cp1252+UTF-16 piece table), routed through the REAL
    * parse gate's content-type dispatch, and the oracle restates the
    * extracted text (and the RTF \info title) closed-form. Conformance
    * on the reference's own samples — TestRTFParser's three
    * expectations, TestOOParser's ootest pair, TestXlsxParser's
    * verbatim string — is OfficeDocsSpec. */
  val officeText = Q(
    "office_text",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val k = col("doc_id")
      d.select(k.as("doc_id"), (k % 5).cast("int").as("fmt"),
          officeTextUdf(k, (k % 5).cast("int")).as("r"))
        .select(col("doc_id"), col("fmt"),
          col("r._1").as("status"),
          col("r._2").as("title"),
          col("r._3").as("text"))
    },
    Some("""
      SELECT doc_id,
        CAST(doc_id % 5 AS INT) AS fmt,
        CAST(1 AS INT) AS status,
        CASE WHEN doc_id % 5 = 3 THEN 'Doc ' || doc_id ELSE '' END AS title,
        CASE doc_id % 5
          WHEN 0 THEN 'Corpus doc ' || doc_id || ' line one' || chr(10)
            || 'shard ' || (doc_id % 16) || ' line two'
          WHEN 1 THEN 'Corpus doc ' || doc_id || ' line one' || chr(10)
            || 'shard ' || (doc_id % 16) || ' line two'
          WHEN 2 THEN 'data' || doc_id || ' alpha' || doc_id || ' beta'
            || (doc_id % 7)
          WHEN 3 THEN 'Corpus doc ' || doc_id || ' body' || chr(10)
            || 'line two ' || (doc_id % 16)
          ELSE 'Corpus doc ' || doc_id || ' body one' || chr(10)
            || 'unicode part ' || (doc_id % 16)
        END AS text
      FROM documents"""))


  private val mainContentUdf = udf((html: String) =>
    graft.ops.Boilerplate.mainContent(html))

  /** tika.extractor=boilerpipe analog, first-party
    * ([[graft.ops.Boilerplate]] — the WSDM'10 shallow-text-features
    * algorithm; conformance on the reference's own
    * TestBoilerpipeExtraction fixture is BoilerplateSpec): per doc a
    * planted page with nav furniture, a heading, a 17-word paragraph,
    * a short closing line, plus — on odd docs — a fully-linked menu
    * block before the closing line, which flips the classifier into
    * its after-link-dense arm and drops the short closer (threshold
    * 40). The oracle restates the kept text closed-form per parity,
    * so a hash match pins block segmentation, link density, BOTH
    * decision arms, and the terminating-footer pass. */
  val mainContent = Q(
    "main_content",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val k = col("doc_id")
      val html = concat(
        lit("<html><head><title>T</title></head><body>" +
          "<div>Home | About | Contact</div><h1>Story "), k,
        lit(" heading</h1><p>Main body paragraph for document "), k,
        lit(" with seventeen total words covering the topic in ample " +
          "detail today</p>"),
        when(k % 2 === 1, lit("<div><a href='/a'>more stories here</a> " +
          "<a href='/b'>related links now</a></div>")).otherwise(lit("")),
        lit("<p>Closing remarks mention shard "), k % 16,
        lit(" briefly</p><div>Copyright 2024 Example Corp</div>" +
          "</body></html>"))
      d.select(k.as("doc_id"), mainContentUdf(html).as("main_text"))
    },
    Some("""
      SELECT doc_id,
        'Story ' || doc_id || ' heading' || chr(10)
        || 'Main body paragraph for document ' || doc_id
        || ' with seventeen total words covering the topic in ample'
        || ' detail today'
        || CASE WHEN doc_id % 2 = 1 THEN ''
           ELSE chr(10) || 'Closing remarks mention shard '
             || (doc_id % 16) || ' briefly' END AS main_text
      FROM documents"""))

  val all: Seq[Q] = Seq(feedParse, subcollectionTag, headingsExtract,
    ccLicense, urlNormalizeChain, indexEnriched, zipParse, jsOutlinks,
    reltagTags, parsefilterRegex, indexReplaceLinks, containerDetect,
    pdfText, officeText, mainContent)
}
