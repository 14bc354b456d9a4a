package graft

import org.apache.spark.sql.functions._

import Queries.t

/** Batch 7 — source/sink surface (SURVEY §2.1): seed scan, point lookup,
  * dump formats (CSV / WARC / CommonCrawl JSON), sitemap source, exchange
  * routing. Dump queries produce the exact sink LINES as rows so the
  * formatting logic itself is oracle-checked; the file-writing shell is
  * `df.write.text/csv` (ops layer). */
object QueriesSinks {

  /** '' → default, digits → int (ANSI-safe optional-field parse). */
  private def numOr(c: org.apache.spark.sql.Column, dflt: Int) =
    when(c === "", lit(dflt)).otherwise(c.cast("int"))

  /** S1 — seed-file scan: parse `url[\tk=v]…` lines (comments/blanks
    * skipped, reserved keys promoted) — the column-expression twin of
    * ops.Inject.parseSeedLine (Injector.java:62-180). */
  val seedScan = Q(
    "seed_scan",
    (s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderkey").as("k"))
      val line = when(col("k") % 7 === 0, concat(lit("# seed batch "), col("k")))
        .when(col("k") % 7 === 1, lit(""))
        .otherwise(concat(
          lit("http://seed"), col("k"), lit(".example.com/"),
          when(col("k") % 3 === 0,
            concat(lit("\tnutch.score="), col("k") % 10)).otherwise(lit("")),
          when(col("k") % 5 === 0,
            concat(lit("\tnutch.fetchInterval="), lit(3600) * (lit(1) + col("k") % 24)))
            .otherwise(lit(""))))
      o.select(col("k"), line.as("line"))
        .filter(col("line") =!= "" && !col("line").startsWith("#"))
        .select(
          regexp_extract(col("line"), "^([^\\t]+)", 1).as("url"),
          numOr(regexp_extract(col("line"), "nutch\\.score=([0-9]+)", 1), 1)
            .cast("double").as("score"),
          numOr(regexp_extract(col("line"), "nutch\\.fetchInterval=([0-9]+)", 1),
            2592000).as("interval"))
    },
    Some("""
      WITH lines AS (
        SELECT o_orderkey AS k,
          CASE WHEN o_orderkey % 7 = 0 THEN '# seed batch ' || o_orderkey
               WHEN o_orderkey % 7 = 1 THEN ''
               ELSE 'http://seed' || o_orderkey || '.example.com/'
                 || CASE WHEN o_orderkey % 3 = 0
                         THEN chr(9) || 'nutch.score=' || (o_orderkey % 10)
                         ELSE '' END
                 || CASE WHEN o_orderkey % 5 = 0
                         THEN chr(9) || 'nutch.fetchInterval=' || (3600 * (1 + o_orderkey % 24))
                         ELSE '' END
          END AS line
        FROM orders)
      SELECT regexp_extract(line, '^([^\t]+)', 1) AS url,
        CAST(COALESCE(TRY_CAST(regexp_extract(line, 'nutch\.score=([0-9]+)', 1) AS INTEGER), 1) AS DOUBLE) AS score,
        COALESCE(TRY_CAST(regexp_extract(line, 'nutch\.fetchInterval=([0-9]+)', 1) AS INTEGER), 2592000) AS interval
      FROM lines WHERE line <> '' AND line NOT LIKE '#%'"""))

  /** S4 — point lookup (CrawlDbReader -url; readUrl point-get). The plan
    * must show the IN-list pushed into the parquet scan. */
  val pointLookup = Q(
    "point_lookup",
    (s, dir) => {
      val o = t(s, dir, "orders")
      o.filter(col("o_orderkey").isin(1L, 2L, 3L, 5L, 7L, 32L, 33L, 34L))
        .select(col("o_orderkey").as("url"),
          col("o_orderstatus").as("status"),
          col("o_totalprice").as("score"))
    },
    Some("""
      SELECT o_orderkey AS url, o_orderstatus AS status,
             o_totalprice AS score
      FROM orders WHERE o_orderkey IN (1, 2, 3, 5, 7, 32, 33, 34)"""))

  /** S6/S12 — CSV dump lines (CrawlDbReader.java:160-369 CrawlDbDumpCsv:
    * quoted url, status name, score, fetch-time). */
  val csvDump = Q(
    "csv_dump",
    (s, dir) => {
      val o = t(s, dir, "orders")
      // price renders via DECIMAL(12,2) so both engines print "123.45"
      // (double→string shortest-repr rules differ across engines)
      o.select(concat(
        lit("\""), lit("http://u"), col("o_orderkey"), lit(".example.com/"),
        lit("\","), col("o_orderstatus"),
        lit(","), col("o_totalprice").cast("decimal(12,2)"),
        lit(","), col("o_orderdate")).as("line"))
    },
    Some("""
      SELECT '"' || 'http://u' || o_orderkey || '.example.com/' || '",'
        || o_orderstatus || ',' || CAST(o_totalprice AS DECIMAL(12,2))
        || ',' || o_orderdate AS line
      FROM orders"""))

  /** S9 — WARC response-record headers (WARC/1.0; CommonCrawlDataDumper /
    * warc exporter shape): exact header block per document with
    * Content-Length and payload digest. */
  val warcExport = Q(
    "warc_export",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val crlf = lit("\r\n")
      d.select(col("doc_id"),
        concat(
          lit("WARC/1.0"), crlf,
          lit("WARC-Type: response"), crlf,
          lit("WARC-Target-URI: http://doc"), col("doc_id"),
          lit(".example.com/"), crlf,
          lit("WARC-Payload-Digest: md5:"), md5(col("text")), crlf,
          lit("Content-Type: text/plain"), crlf,
          lit("Content-Length: "), octet_length(col("text")).cast("long"))
          .as("warc_header"))
    },
    Some("""
      SELECT doc_id,
        'WARC/1.0' || chr(13) || chr(10) ||
        'WARC-Type: response' || chr(13) || chr(10) ||
        'WARC-Target-URI: http://doc' || doc_id || '.example.com/' || chr(13) || chr(10) ||
        'WARC-Payload-Digest: md5:' || md5(text) || chr(13) || chr(10) ||
        'Content-Type: text/plain' || chr(13) || chr(10) ||
        'Content-Length: ' || strlen(text) AS warc_header
      FROM documents"""))

  /** S10 — CommonCrawl-style JSON dump lines (CommonCrawlDataDumper
    * jackson output), built by explicit concat so both engines emit the
    * byte-identical line. */
  val commoncrawlDump = Q(
    "commoncrawl_dump",
    (s, dir) => {
      val d = t(s, dir, "documents")
      d.select(concat(
        lit("{\"url\":\"http://doc"), col("doc_id"),
        lit(".example.com/\",\"digest\":\""), md5(col("text")),
        lit("\",\"length\":"), octet_length(col("text")).cast("long"),
        lit(",\"lang\":\""), col("lang"), lit("\"}")).as("json_line"))
    },
    Some("""
      SELECT '{"url":"http://doc' || doc_id || '.example.com/","digest":"'
        || md5(text) || '","length":' || strlen(text)
        || ',"lang":"' || lang || '"}' AS json_line
      FROM documents"""))

  /** S13 — sitemap full path, cross-engine: assemble per-host sitemap
    * XML blobs (loc + priority + changefreq), extract the url records
    * back out, map them onto crawl-datum fields exactly as the operator
    * does (priority → score with the 0 ⇒ 0.5 default, changefreq →
    * interval; SitemapProcessor.java:310-348), and merge against an
    * existing crawldb slice — existing entries win, new entries inject
    * (SitemapReducer.reduce:402-437). The per-host fetch/robots/index
    * recursion runs through the Protocol seam and is covered by
    * SitemapSpec; this query checks the parse+map+merge algebra. */
  val sitemapParse = Q(
    "sitemap_parse",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val okey = col("o_orderkey")
      val freqs = array(lit("always"), lit("hourly"), lit("daily"),
        lit("weekly"), lit("monthly"), lit("yearly"), lit("never"))
      val frag = concat(
        lit("<url><loc>http://sm"), lpad(okey.cast("string"), 10, "0"),
        lit(".example.com/</loc><priority>"),
        ((okey % 11).cast("double") / 10.0).cast("string"),
        lit("</priority><changefreq>"),
        element_at(freqs, (okey % 7 + 1).cast("int")),
        lit("</changefreq></url>"))
      val blobs = o.select((okey % 20).as("grp"), frag.as("frag"))
        .groupBy("grp")
        .agg(concat(lit("<urlset>"),
          array_join(array_sort(collect_list(col("frag"))), ""),
          lit("</urlset>")).as("xml"))
      val recs = blobs.select(
          explode(regexp_extract_all(col("xml"),
            lit("<url>(.*?)</url>"), lit(1))).as("rec"))
        .select(
          regexp_extract(col("rec"), "<loc>([^<]+)</loc>", 1).as("url"),
          regexp_extract(col("rec"), "<priority>([^<]+)</priority>", 1)
            .cast("double").as("prio"),
          regexp_extract(col("rec"), "<changefreq>([^<]+)</changefreq>", 1)
            .as("freq"))
      val sm = recs.select(col("url"),
        when(col("prio") > 0, col("prio")).otherwise(0.5).as("sm_score"),
        when(col("freq") === "always", 60) // clamped to min_interval
          .when(col("freq") === "hourly", 3600)
          .when(col("freq") === "daily", 86400)
          .when(col("freq") === "weekly", 604800)
          .when(col("freq") === "monthly", 2592000)
          .otherwise(31536000) // yearly + never (clamped to max)
          .as("sm_interval"))
      val db = o.filter(okey % 3 === 0).select(
        concat(lit("http://sm"), lpad(okey.cast("string"), 10, "0"),
          lit(".example.com/")).as("url"),
        col("o_totalprice").as("db_score"))
      sm.join(db, Seq("url"), "full_outer")
        .select(col("url"),
          when(col("db_score").isNotNull, lit("existing"))
            .otherwise(lit("new")).as("status"),
          coalesce(col("db_score"), col("sm_score")).as("score"),
          when(col("db_score").isNotNull, lit(null).cast("int"))
            .otherwise(col("sm_interval")).as("fetch_interval"))
    },
    Some("""
      WITH blobs AS (
        SELECT o_orderkey % 20 AS grp,
          '<urlset>' || string_agg(
            '<url><loc>http://sm' || lpad(CAST(o_orderkey AS VARCHAR), 10, '0')
              || '.example.com/</loc><priority>'
              || CAST(CAST(o_orderkey % 11 AS DOUBLE) / 10.0 AS VARCHAR)
              || '</priority><changefreq>'
              || (['always','hourly','daily','weekly','monthly','yearly',
                   'never'][(o_orderkey % 7 + 1)::INT])
              || '</changefreq></url>', '' ORDER BY o_orderkey)
            || '</urlset>' AS xml
        FROM orders GROUP BY 1),
      recs AS (
        SELECT unnest(regexp_extract_all(xml, '<url>(.*?)</url>', 1)) AS rec
        FROM blobs),
      sm AS (
        SELECT regexp_extract(rec, '<loc>([^<]+)</loc>', 1) AS url,
          CASE WHEN CAST(regexp_extract(rec, '<priority>([^<]+)</priority>', 1)
                    AS DOUBLE) > 0
               THEN CAST(regexp_extract(rec, '<priority>([^<]+)</priority>', 1)
                    AS DOUBLE)
               ELSE 0.5 END AS sm_score,
          CASE regexp_extract(rec, '<changefreq>([^<]+)</changefreq>', 1)
            WHEN 'always' THEN 60 WHEN 'hourly' THEN 3600
            WHEN 'daily' THEN 86400 WHEN 'weekly' THEN 604800
            WHEN 'monthly' THEN 2592000 ELSE 31536000 END AS sm_interval
        FROM recs),
      db AS (
        SELECT 'http://sm' || lpad(CAST(o_orderkey AS VARCHAR), 10, '0')
            || '.example.com/' AS url,
          o_totalprice AS db_score
        FROM orders WHERE o_orderkey % 3 = 0)
      SELECT COALESCE(sm.url, db.url) AS url,
        CASE WHEN db_score IS NOT NULL THEN 'existing' ELSE 'new' END AS status,
        COALESCE(db_score, sm_score) AS score,
        CASE WHEN db_score IS NOT NULL THEN NULL
             ELSE sm_interval END AS fetch_interval
      FROM sm FULL OUTER JOIN db ON sm.url = db.url"""))

  /** S8 — exchange router (exchange-jexl): first-match expression rules
    * route each document to an index writer. */
  val exchangeRoute = Q(
    "exchange_route",
    (s, dir) => {
      val o = t(s, dir, "orders")
      o.select(col("o_orderkey").as("url"),
        when(col("o_orderstatus") === "F" && col("o_totalprice") > 200000.0,
          lit("solr-archive"))
          .when(col("o_orderstatus") === "O", lit("elastic-live"))
          .when(col("o_orderpriority").startsWith("1"), lit("solr-priority"))
          .otherwise(lit("default")).as("writer"))
    },
    Some("""
      SELECT o_orderkey AS url,
        CASE WHEN o_orderstatus = 'F' AND o_totalprice > 200000.0 THEN 'solr-archive'
             WHEN o_orderstatus = 'O' THEN 'elastic-live'
             WHEN o_orderpriority LIKE '1%' THEN 'solr-priority'
             ELSE 'default' END AS writer
      FROM orders"""))

  /** S5 — ARC source roundtrip (ArcRecordReader.java:39-210): per-doc
    * single-member gzip ARC fragments are built IN the plan (header
    * line `URL IP date mime length` + payload through the codegen'd
    * gzip encoder), then parsed back by the real ArcSource reader —
    * member framing, header split, declared-length truncation, and
    * timestamp parse all get an independent SQL oracle that computes
    * the same fields straight from `documents`. */
  val arcRoundtrip = Q(
    "arc_roundtrip",
    (s, dir) => {
      import s.implicits._
      import graft.sources.ArcSource
      val d = t(s, dir, "documents").filter(col("doc_id") < 50)
      val url = concat(lit("http://arc"), col("doc_id"),
        lit(".example.com/p"))
      val ip = concat(lit("10.0.0."), col("doc_id") % 250)
      val body = substring(col("text"), 1, 200)
      val header = concat(url, lit(" "), ip,
        lit(" 20240101120000 text/html "),
        octet_length(encode(body, "UTF-8")), lit("\n"))
      val blob = graft.functions.Encoding.encodeCol(
        concat(header, body), lit("UTF-8"), lit(true))
      d.select(col("doc_id"), blob.as("blob"))
        .as[(Long, Array[Byte])]
        .flatMap { case (id, bytes) =>
          ArcSource.records(bytes).map(r => (id, r.url, r.ip, r.timestamp,
            r.contentType, r.declaredLength,
            new String(r.body, java.nio.charset.StandardCharsets.UTF_8)))
        }
        .toDF("doc_id", "url", "ip", "ts", "content_type", "declared_len",
          "body")
    },
    Some("""
      SELECT doc_id,
        'http://arc' || CAST(doc_id AS VARCHAR) || '.example.com/p' AS url,
        '10.0.0.' || CAST(doc_id % 250 AS VARCHAR) AS ip,
        CAST(1704110400000 AS BIGINT) AS ts,
        'text/html' AS content_type,
        CAST(octet_length(encode(substr(text, 1, 200))) AS BIGINT)
          AS declared_len,
        substr(text, 1, 200) AS body
      FROM documents WHERE doc_id < 50"""))

  val all: Seq[Q] = Seq(seedScan, pointLookup, csvDump, warcExport,
    commoncrawlDump, sitemapParse, exchangeRoute, arcRoundtrip)
}
