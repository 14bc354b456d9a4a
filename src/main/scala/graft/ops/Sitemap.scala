package graft.ops

import java.util.regex.Pattern

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.net.Robots
import graft.schemas.{CrawlDatum, CrawlRow, CrawlStatus}

/** S13 — the full SitemapProcessor path (SitemapProcessor.java:92-440):
  * per host (from the HostDb), read robots.txt `Sitemap:` directives
  * (default `/sitemap.xml` when none), fetch and parse each sitemap —
  * recursing into sitemap-index files — and merge the discovered URLs
  * into the crawldb with sitemap-declared priority/changefreq/lastmod
  * mapped onto score/fetchInterval/modifiedTime.
  *
  * Spark shape: hosts are repartitioned and each partition drives the
  * Protocol seam directly (like Fetch); the merge is a url-keyed
  * full-outer join against the crawldb — existing entries win unless
  * `overwriteExisting` copies the sitemap's schedule onto them
  * (SitemapReducer.reduce:402-437). */
object Sitemap {

  final case class Config(
      strict: Boolean = true, // sitemap.strict.parsing
      tryDefaultSitemapXml: Boolean = true, // sitemap.url.default.sitemap.xml
      maxDepth: Int = 3, // recursion bound for sitemap indexes
      minIntervalSec: Float = 60f, // db.fetch.schedule.adaptive.min_interval
      maxIntervalSec: Float = 31536000f,
      overwriteExisting: Boolean = false, // sitemap.url.overwrite.existing
      defaultInterval: Int = 2592000)

  final case class SmUrl(loc: String, priority: Option[Float],
      changefreq: Option[String], lastmod: Option[Long])

  private val urlBlockRe = Pattern.compile("(?is)<url>(.*?)</url>")
  private val smBlockRe = Pattern.compile("(?is)<sitemap>(.*?)</sitemap>")
  private val locRe = Pattern.compile("(?is)<loc>\\s*([^<]+?)\\s*</loc>")
  private val prioRe = Pattern.compile("(?is)<priority>\\s*([^<]+?)\\s*</priority>")
  private val freqRe = Pattern.compile("(?is)<changefreq>\\s*([^<]+?)\\s*</changefreq>")
  private val lastmodRe = Pattern.compile("(?is)<lastmod>\\s*([^<]+?)\\s*</lastmod>")

  /** changefreq → seconds (SitemapProcessor.java:322-329). */
  def changeFreqToInterval(s: String): Option[Int] = s.trim.toLowerCase match {
    case "always" => Some(1)
    case "hourly" => Some(3600)
    case "daily" => Some(86400)
    case "weekly" => Some(604800)
    case "monthly" => Some(2592000)
    case "yearly" => Some(31536000)
    case "never" => Some(Int.MaxValue)
    case _ => None
  }

  /** W3C datetime (the sitemap lastmod format): date-only or full ISO. */
  def parseW3cDate(s: String): Option[Long] = {
    val t = s.trim
    def tryParse[A](f: => Long): Option[Long] =
      try Some(f) catch { case _: Exception => None }
    tryParse(java.time.OffsetDateTime.parse(t).toInstant.toEpochMilli)
      .orElse(tryParse(java.time.LocalDate.parse(t)
        .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli))
  }

  /** Parse one sitemap document. Right(urls) for a urlset,
    * Left(sitemap locations) for a sitemap index. */
  def parseSitemap(xml: String, strict: Boolean): Either[Seq[String], Seq[SmUrl]] = {
    def first(p: Pattern, block: String): Option[String] = {
      val m = p.matcher(block)
      if (m.find()) Some(m.group(1)) else None
    }
    if (xml == null) return Right(Nil)
    val im = smBlockRe.matcher(xml)
    if (xml.toLowerCase.contains("<sitemapindex")) {
      val out = Vector.newBuilder[String]
      while (im.find()) first(locRe, im.group(1)).foreach(out += _)
      Left(out.result())
    } else {
      val out = Vector.newBuilder[SmUrl]
      val um = urlBlockRe.matcher(xml)
      while (um.find()) {
        val block = um.group(1)
        first(locRe, block).foreach { loc =>
          // strict mode: the URL must live under the sitemap's authority —
          // approximated as requiring an absolute http(s) URL here; the
          // caller applies filter/normalize on top
          if (!strict || loc.startsWith("http://") || loc.startsWith("https://"))
            out += SmUrl(loc,
              first(prioRe, block).flatMap(v =>
                scala.util.Try(v.trim.toFloat).toOption),
              first(freqRe, block),
              first(lastmodRe, block).flatMap(parseW3cDate))
        }
      }
      Right(out.result())
    }
  }

  /** The datum a sitemap entry injects (SitemapProcessor.java:310-348):
    * priority → score (0 ⇒ default 0.5), changefreq → clamped interval,
    * lastmod → modifiedTime when not in the future. */
  def toDatum(u: SmUrl, now: Long, cfg: Config): CrawlDatum = {
    val score = u.priority.filter(_ > 0f).getOrElse(0.5f)
    val interval = u.changefreq.flatMap(changeFreqToInterval)
      .map(i => math.max(cfg.minIntervalSec.toInt,
        math.min(cfg.maxIntervalSec.toInt, i)))
      .getOrElse(cfg.defaultInterval)
    val modified = u.lastmod.filter(_ <= now).getOrElse(0L)
    CrawlDatum(CrawlStatus.INJECTED, 0L, 0, interval, score, None,
      modified, Map.empty)
  }

  /** Per-host discovery: robots.txt `Sitemap:` directives (or the
    * default /sitemap.xml), fetch + parse each, recurse into indexes.
    * Runs on executors over a host-partitioned dataset. */
  def discover(hosts: Dataset[String], protocol: Fetch.Protocol,
      now: Long, agent: String, cfg: Config): Dataset[CrawlRow] = {
    val spark: SparkSession = hosts.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast((protocol, agent, cfg))
    hosts.repartition(col("value")).mapPartitions { it =>
      val (proto, agent0, cfg0) = bc.value
      it.flatMap { host =>
        val base = s"http://$host"
        val robots = proto.fetch(s"$base/robots.txt",
          CrawlDatum.unfetched(0L, 0))
        val declared =
          if (robots.code == Fetch.Code.Success)
            Robots.parse(new String(robots.bytes, "UTF-8"), agent0).sitemaps
          else Nil
        val roots =
          if (declared.nonEmpty) declared
          else if (cfg0.tryDefaultSitemapXml) Seq(s"$base/sitemap.xml")
          else Nil
        val out = Vector.newBuilder[CrawlRow]
        def walk(url: String, depth: Int): Unit = {
          if (depth > cfg0.maxDepth) return
          val r = proto.fetch(url, CrawlDatum.unfetched(0L, 0))
          if (r.code == Fetch.Code.Success) {
            parseSitemap(new String(r.bytes, "UTF-8"), cfg0.strict) match {
              case Left(nested) => nested.foreach(walk(_, depth + 1))
              case Right(urls) => urls.foreach(u =>
                graft.functions.Urls.normalize(u.loc).foreach(n =>
                  out += CrawlRow(n, toDatum(u, now, cfg0))))
            }
          }
        }
        roots.foreach(walk(_, 0))
        out.result()
      }
    }
  }

  /** SitemapReducer merge (SitemapProcessor.java:402-437): existing
    * crawldb entries win; with overwriteExisting the sitemap's
    * score/interval/modifiedTime are copied onto them; new URLs enter
    * as DB_UNFETCHED with the sitemap datum. */
  def merge(db: Dataset[CrawlRow], sitemap: Dataset[CrawlRow],
      cfg: Config): Dataset[CrawlRow] = {
    val spark = db.sparkSession
    import spark.implicits._
    // one sitemap datum per url — TOTAL order (score desc, interval
    // asc, modifiedTime desc) so the keeper never depends on Spark's
    // fold order when two sitemap files declare the same url
    val sm1 = sitemap.groupByKey(_.url).reduceGroups { (a, b) =>
      val ka = (-a.datum.score, a.datum.fetchInterval, -a.datum.modifiedTime)
      val kb = (-b.datum.score, b.datum.fetchInterval, -b.datum.modifiedTime)
      if (Ordering[(Float, Int, Long)].lteq(ka, kb)) a else b
    }.map(_._2)
    db.groupByKey(_.url).cogroup(sm1.groupByKey(_.url)) { (url, dbIt, smIt) =>
      val orig = dbIt.toSeq.headOption
      val sm = smIt.toSeq.headOption
      (orig, sm) match {
        case (Some(o), Some(s)) if cfg.overwriteExisting =>
          Iterator.single(CrawlRow(url, o.datum.copy(
            score = s.datum.score,
            fetchInterval = s.datum.fetchInterval,
            modifiedTime = s.datum.modifiedTime)))
        case (Some(o), _) => Iterator.single(o)
        case (None, Some(s)) => Iterator.single(CrawlRow(url,
          s.datum.copy(status = CrawlStatus.DB_UNFETCHED)))
        case _ => Iterator.empty
      }
    }
  }
}
