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

  /** S13 — sitemap source: assemble per-host sitemap XML blobs, then
    * extract `<loc>` entries back out (sitemap plugin SiteMapParser
    * shape: blob → url list). */
  val sitemapParse = Q(
    "sitemap_parse",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val frag = concat(lit("<url><loc>http://sm"),
        lpad(col("o_orderkey").cast("string"), 10, "0"),
        lit(".example.com/</loc></url>"))
      val blobs = o.select((col("o_orderkey") % 20).as("grp"), frag.as("frag"))
        .groupBy("grp")
        .agg(concat(lit("<urlset>"),
          array_join(array_sort(collect_list(col("frag"))), ""),
          lit("</urlset>")).as("xml"))
      blobs.select(col("grp"),
          explode(regexp_extract_all(col("xml"), lit("<loc>([^<]+)</loc>"),
            lit(1))).as("url"))
    },
    Some("""
      WITH blobs AS (
        SELECT o_orderkey % 20 AS grp,
          '<urlset>' || string_agg(
            '<url><loc>http://sm' || lpad(CAST(o_orderkey AS VARCHAR), 10, '0')
              || '.example.com/</loc></url>', '' ORDER BY o_orderkey)
            || '</urlset>' AS xml
        FROM orders GROUP BY 1)
      SELECT grp, unnest(regexp_extract_all(xml, '<loc>([^<]+)</loc>', 1)) AS url
      FROM blobs"""))

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

  val all: Seq[Q] = Seq(seedScan, pointLookup, csvDump, warcExport,
    commoncrawlDump, sitemapParse, exchangeRoute)
}
