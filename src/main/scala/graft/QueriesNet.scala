package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.net.RegexUrlFilter

/** F2 (URL filter chain) + F4/§2.11 (generator eligibility via fetch
  * schedules) as oracle-checked queries. */
object QueriesNet {

  private val T0 = 1690000000000L

  /** F2 — urlfilter-regex over synthetic URLs. The rule set is parsed by
    * the real engine (net.RegexUrlFilter, conformance-tested against the
    * reference's sample suites) and compiled to a codegen'd first-match-
    * wins CASE/rlike cascade (RegexURLFilterBase.java:170-206). */
  val urlFilter = Q(
    "url_filter",
    (s, dir) => {
      val filter = RegexUrlFilter.parse(Iterator(
        "# deny media suffixes, query-ish urls; accept the rest",
        "-(?i)\\.(?:gif|jpg|ico|css|zip|exe)$",
        "-[?*!@=]",
        "+."))
      val o = Queries.t(s, dir, "orders")
      val urls = o.select(concat(
        lit("http://host"), col("o_orderkey") % 25,
        lit(".example.com/page/"), col("o_orderkey"),
        element_at(array(lit(".html"), lit(".gif"), lit("?q=1"),
          lit(".jpg"), lit("/")), (col("o_orderkey") % 5).cast("int") + 1))
        .as("url"))
      urls.filter(filter.toColumn(col("url"))).select(col("url"))
    },
    Some("""
      WITH urls AS (
        SELECT 'http://host' || CAST(o_orderkey % 25 AS VARCHAR)
          || '.example.com/page/' || CAST(o_orderkey AS VARCHAR)
          || CASE CAST(o_orderkey % 5 AS INTEGER)
               WHEN 0 THEN '.html' WHEN 1 THEN '.gif' WHEN 2 THEN '?q=1'
               WHEN 3 THEN '.jpg' ELSE '/' END AS url
        FROM orders)
      SELECT url FROM urls
      WHERE NOT regexp_matches(url, '(?i)\.(?:gif|jpg|ico|css|zip|exe)$')
        AND NOT regexp_matches(url, '[\?\*!@=]')"""))

  /** F4 + §2.11 — generator eligibility: shouldFetch gate
    * (AbstractFetchSchedule.java:190-203: due when fetchTime ≤ curTime,
    * and a fetchTime more than maxInterval in the future is pulled back
    * to curTime, i.e. also due), then the Generator's per-host cap +
    * global topN (Generator.java:178-643). */
  val generateEligibility = Q(
    "generate_eligibility",
    (s, dir) => {
      val curTime = T0 + 1000L * 3600000L
      val maxIntervalMs = 7776000000L
      val o = Queries.t(s, dir, "orders")
      val fetchlist = o.select(
        col("o_orderkey").as("url"),
        (col("o_custkey") % 50).as("host"),
        col("o_totalprice").as("score"),
        (lit(T0) + (col("o_orderkey") % 2000) * 10800000L).as("fetch_time"))
      val due = fetchlist.filter(
        col("fetch_time") <= curTime ||
          col("fetch_time") - curTime > maxIntervalMs)
      val perHost = Window.partitionBy(col("host"))
        .orderBy(desc("score"), asc("url"))
      due.withColumn("rk", row_number().over(perHost))
        .filter(col("rk") <= 20)
        .orderBy(desc("score"), asc("url"))
        .limit(100)
        .select(col("url"), col("host"), col("score"), col("fetch_time"))
    },
    Some(s"""
      WITH fl AS (
        SELECT o_orderkey AS url, o_custkey % 50 AS host,
               o_totalprice AS score,
               $T0 + (o_orderkey % 2000) * 10800000 AS fetch_time
        FROM orders),
      due AS (
        SELECT * FROM fl
        WHERE fetch_time <= ${T0 + 1000L * 3600000L}
           OR fetch_time - ${T0 + 1000L * 3600000L} > 7776000000)
      SELECT url, host, score, fetch_time FROM (
        SELECT *, row_number() OVER (PARTITION BY host
                    ORDER BY score DESC, url) AS rk FROM due)
      WHERE rk <= 20
      ORDER BY score DESC, url LIMIT 100"""))

  /** J9 — Generate with HostDb-driven per-host overrides, run through
    * the REAL operator (ops/Generate + UpdateHostDb.HostRow): the JEXL
    * `generate.max.count.expr` computes a per-host cap from the host's
    * fetched census, `generate.fetch.delay.expr` stamps
    * `_variableFetchDelay_` into datum metadata
    * (Generator.java:369-392,506-545). Hosts are o_custkey%50; the cap
    * expression resolves against the broadcast hostdb columns. */
  val generateHostdb = Q(
    "generate_hostdb",
    (s, dir) => {
      import graft.ops.{Generate, UpdateHostDb}
      import graft.schemas.{CrawlRow, CrawlStatus}
      import s.implicits._
      val o = Queries.t(s, dir, "orders")
      val db = o.select(
        concat(lit("http://h"), col("o_custkey") % 50, lit(".test/p/"),
          col("o_orderkey")).as("url"),
        struct(
          lit(CrawlStatus.DB_UNFETCHED).cast("tinyint").as("status"),
          lit(T0).as("fetchTime"),
          lit(0).as("retries"),
          lit(2592000).as("fetchInterval"),
          col("o_totalprice").cast("float").as("score"),
          lit(null).cast("string").as("signature"),
          lit(0L).as("modifiedTime"),
          map().cast("map<string,string>").as("metadata")).as("datum"))
        .as[CrawlRow]
      val hostdb = o.groupBy(
        concat(lit("h"), col("o_custkey") % 50, lit(".test")).as("host"))
        .agg(
          count(when(col("o_orderstatus") === "O", 1)).as("unfetched"),
          count(when(col("o_orderstatus") === "F", 1)).as("fetched"),
          lit(0L).as("gone"), lit(0L).as("redirTemp"),
          lit(0L).as("redirPerm"), lit(0L).as("notModified"),
          lit(0L).as("dnsFailures"),
          count(when(col("o_orderstatus") === "P", 1))
            .as("connectionFailures"),
          lit(0.0).as("score"), lit(T0).as("lastCheck"))
        .as[UpdateHostDb.HostRow]
      val fl = Generate(db,
        Generate.Config(topN = 500, maxPerHost = 5, curTime = T0,
          maxCountExpr = Some("1 + fetched / 100"),
          fetchDelayExpr = Some("1000 * (1 + connectionFailures)")),
        graft.crawl.DefaultFetchSchedule(graft.crawl.ScheduleConfig()),
        hostDb = Some(hostdb))
      fl.toDF().select(col("url"), col("segnum"),
        element_at(col("datum.metadata"), Generate.VariableFetchDelayKey)
          .as("fetch_delay_ms"))
    },
    Some(s"""
      WITH hostdb AS (
        SELECT o_custkey % 50 AS hk,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS fetched,
               COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS connfail
        FROM orders GROUP BY 1),
      fl AS (
        SELECT 'http://h' || (o_custkey % 50) || '.test/p/' || o_orderkey
                 AS url,
               o_custkey % 50 AS hk,
               CAST(o_totalprice AS FLOAT4) AS score
        FROM orders),
      j AS (
        SELECT fl.url, fl.score, hostdb.fetched, hostdb.connfail,
               row_number() OVER (PARTITION BY fl.hk
                 ORDER BY fl.score DESC, fl.url) AS rk
        FROM fl JOIN hostdb USING (hk))
      SELECT url, 1 AS segnum,
             CAST(CAST(1000 * (1 + connfail) AS BIGINT) AS VARCHAR)
               AS fetch_delay_ms
      FROM j
      WHERE rk <= CAST(ROUND(1 + fetched / 100) AS INT)
      ORDER BY score DESC, url LIMIT 500"""))

  /** F2 — the domain allow/deny filter pair over a synthetic URL mix
    * (DomainURLFilter.java / DomainDenylistURLFilter.java): hosts built
    * so each match tier fires — registrable-domain (`okdomain.com`),
    * exact-host (`www.exact.com`), public-suffix (`net`) on the
    * allowlist; suffix (`org`) + host (`mail.exact.com`) on the
    * denylist. The synthetic hosts are 3-label under com/net/org, so
    * the oracle's last-label/last-two-label SQL equals the PSL engine's
    * answer and both sides hash-compare. Filters run as codegen'd InSet
    * membership — no UDF, no shuffle. */
  val urlFilterDomain = Q(
    "url_filter_domain",
    (s, dir) => {
      import graft.net.DomainUrlFilter
      val allow = new DomainUrlFilter(
        Set("okdomain.com", "www.exact.com", "net"), deny = false)
      val deny = new DomainUrlFilter(
        Set("org", "mail.exact.com"), deny = true)
      val o = Queries.t(s, dir, "orders")
      val k = col("o_orderkey")
      val host = when(k % 4 === 0,
          concat(lit("a"), k % 7, lit(".okdomain.com")))
        .when(k % 4 === 1,
          concat(when(k % 8 === 1, lit("www")).otherwise(lit("mail")),
            lit(".exact.com")))
        .when(k % 4 === 2, concat(lit("x"), k % 5, lit(".thing.net")))
        .otherwise(concat(lit("y"), k % 5, lit(".nope.org")))
      o.select(concat(lit("http://"), host, lit("/p/"), k).as("url"))
        .select(col("url"),
          allow.toColumn(col("url")).as("allowed"),
          deny.toColumn(col("url")).as("deny_pass"))
    },
    Some("""
      WITH u AS (
        SELECT 'http://' ||
          CASE CAST(o_orderkey % 4 AS INTEGER)
            WHEN 0 THEN 'a' || CAST(o_orderkey % 7 AS VARCHAR)
                        || '.okdomain.com'
            WHEN 1 THEN (CASE WHEN o_orderkey % 8 = 1 THEN 'www'
                         ELSE 'mail' END) || '.exact.com'
            WHEN 2 THEN 'x' || CAST(o_orderkey % 5 AS VARCHAR)
                        || '.thing.net'
            ELSE 'y' || CAST(o_orderkey % 5 AS VARCHAR) || '.nope.org'
          END || '/p/' || CAST(o_orderkey AS VARCHAR) AS url
        FROM orders),
      q AS (
        SELECT url,
          regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
          regexp_extract(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1),
            '([^.]+)$', 1) AS suffix,
          regexp_extract(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1),
            '([^.]+\.[^.]+)$', 1) AS dom
        FROM u)
      SELECT url,
        (suffix IN ('okdomain.com', 'www.exact.com', 'net')
          OR dom IN ('okdomain.com', 'www.exact.com', 'net')
          OR host IN ('okdomain.com', 'www.exact.com', 'net')) AS allowed,
        (host <> '' AND NOT (suffix IN ('org', 'mail.exact.com')
          OR dom IN ('org', 'mail.exact.com')
          OR host IN ('org', 'mail.exact.com'))) AS deny_pass
      FROM q"""))

  private val robotsUdf = org.apache.spark.sql.functions.udf(
    (k: Long) => {
      val v = (k % 4).toInt
      val delay = 1 + k % 7
      val content = v match {
        case 0 => s"User-agent: *\nDisallow: /private/\nCrawl-delay: $delay\n"
        case 1 => "User-agent: graft\nDisallow: /\n\n" +
          "User-agent: *\nDisallow: /none\n" +
          "Sitemap: http://example.com/s.xml\n"
        case 2 => "User-agent: *\nDisallow: /*.pdf$\n"
        case _ => "User-agent: *\nAllow: /private/ok\nDisallow: /private/\n"
      }
      val path = v match {
        case 0 => if (k % 2 == 0) "/private/page.html" else "/open/x.html"
        case 1 => "/anything.html"
        case 2 => if (k % 2 == 0) "/doc.pdf" else "/doc.pdfx"
        case _ => if (k % 2 == 0) "/private/ok.html" else "/private/no.html"
      }
      val rules = graft.net.Robots.parse(content, "graft")
      (rules.isAllowed(path), rules.crawlDelayMs, rules.sitemaps.size)
    })

  /** robots.txt semantics as an oracle query (the multimodal_dims
    * pattern): per doc, a plan-synthesized robots.txt exercises one of
    * four REP features — prefix Disallow + Crawl-delay, agent-specific
    * group overriding `*` (+ Sitemap discovery), `*`/`$` wildcard
    * rules, and Allow/Disallow longest-match precedence — and the
    * oracle restates the verdicts in closed form, so a hash match
    * proves group selection, precedence, wildcards, crawl-delay
    * extraction, and sitemap collection all at once. The parser itself
    * is the one the fetch pacer consults (net/Robots.scala, the
    * crawler-commons SimpleRobotRulesParser subset). */
  val robotsParse = Q(
    "robots_parse",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val d = Queries.t(s, dir, "documents")
      val r = robotsUdf(col("doc_id"))
      d.select(col("doc_id"), r.as("r"))
        .select(col("doc_id"),
          col("r._1").as("allowed"),
          col("r._2").as("crawl_delay_ms"),
          col("r._3").as("n_sitemaps"))
    },
    Some("""
      SELECT doc_id,
        CASE (doc_id % 4)::INT
          WHEN 0 THEN doc_id % 2 = 1
          WHEN 1 THEN FALSE
          WHEN 2 THEN doc_id % 2 = 1
          ELSE doc_id % 2 = 0
        END AS allowed,
        CASE WHEN doc_id % 4 = 0 THEN (1 + doc_id % 7) * 1000
        END AS crawl_delay_ms,
        CASE WHEN doc_id % 4 = 1 THEN 1 ELSE 0 END AS n_sitemaps
      FROM documents"""))

  /** External-command integration at scale (the parse-ext/RDD.pipe
    * shape): stream every partition's documents through ONE external
    * process (`tr a-z A-Z`) — stdin lines out stdout lines, one fork
    * per partition, not per record — and prove the round-trip against
    * DuckDB's UPPER. Rows ride as `doc_id \t text` frames (documents
    * are single-line by construction); digits pass through tr
    * unchanged. This is the scalable form of plugins.ExtParser's
    * per-record command: at 100 TB you fork ~one process per task,
    * never per page. */
  val extPipe = Q(
    "ext_pipe",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      import s.implicits._
      val d = Queries.t(s, dir, "documents")
      val piped = d
        .select(concat_ws("\t", col("doc_id"), col("text")).as("line"))
        .as[String]
        .rdd.pipe(Seq("tr", "a-z", "A-Z"))
      s.createDataset(piped)
        .map { l =>
          val i = l.indexOf('\t')
          (l.take(i).toLong, l.drop(i + 1))
        }
        .toDF("doc_id", "upper_text")
    },
    Some("""
      SELECT doc_id, UPPER(text) AS upper_text FROM documents"""))

  val all: Seq[Q] = Seq(urlFilter, generateEligibility, generateHostdb,
    urlFilterDomain, robotsParse, extPipe)
}
