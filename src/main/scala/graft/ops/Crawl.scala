package graft.ops

import org.apache.spark.sql.SparkSession

import graft.crawl.{FetchSchedule, UpdateDb}
import graft.plugins.Extensions
import graft.tables.{CrawlDbTable, LinkDbTable, Segment}

/** The crawl conductor — the `bin/crawl` driver re-expressed as a
  * library call (src/bin/crawl:285-406 lifecycle: inject once, then per
  * round generate → fetch → parse → updatedb → invertlinks → dedup,
  * with hostdb refresh and an index pass at the end).
  *
  * Clock-free: round r runs at `startTime + r·roundMillis`, so every
  * run is reproducible. All state lives in the copy-on-write tables
  * under `root`. */
object Crawl {

  final case class Config(
      rounds: Int = 1,
      topN: Long = Long.MaxValue,
      maxPerHost: Int = Int.MaxValue,
      startTime: Long = 1700000000000L,
      roundMillis: Long = 3600 * 1000L,
      agent: String = "graft",
      dedup: Boolean = true,
      index: Boolean = true)

  final case class RoundStats(round: Int, generated: Long, fetched: Long,
      dbSize: Long)

  final case class Summary(rounds: Seq[RoundStats], indexed: Long,
      hosts: Long)

  def run(spark: SparkSession, root: String, seeds: Seq[String],
      protocol: Fetch.Protocol, registry: Extensions.Registry,
      cfg: Config): Summary = {
    import spark.implicits._
    val crawldb = new CrawlDbTable(spark, s"$root/crawldb")
    val linkdb = new LinkDbTable(spark, s"$root/linkdb")
    val schedule: FetchSchedule = registry.schedule
    val filter = registry.filterChain

    // inject
    crawldb.install(
      Inject(crawldb.read(), spark.createDataset(seeds), Inject.Config(),
        filter, cfg.startTime),
      "inject")

    var segments = Vector.empty[Segment]
    val stats = (1 to cfg.rounds).map { r =>
      val now = cfg.startTime + r * cfg.roundMillis
      val seg = new Segment(spark, s"$root/segments/r$r")
      seg.writeGenerate(Generate(crawldb.read(),
        Generate.Config(topN = cfg.topN, maxPerHost = cfg.maxPerHost,
          curTime = now, segnum = r), schedule))
      val generated = seg.generate.count()

      val (fetch, content) = Fetch(seg.generate, protocol, now, cfg.agent)
      seg.writeFetch(fetch); seg.writeContent(content)

      val parsed = Parse(seg.fetch, seg.content, Parse.Config(), filter)
      seg.writeParseData(parsed.parseData)
      seg.writeParseText(parsed.parseText)
      seg.writeCrawlParse(parsed.crawlParse)

      crawldb.install(
        UpdateDb(crawldb.read().union(seg.fetch).union(seg.crawlParse),
          now, schedule, registry.scoring),
        s"updatedb-r$r")
      linkdb.install(
        InvertLinks(seg.parseData, linkdb.read(), InvertLinks.Config()),
        s"invertlinks-r$r")
      if (cfg.dedup)
        crawldb.install(Dedup(crawldb.read()), s"dedup-r$r")
      segments :+= seg
      RoundStats(r, generated,
        seg.fetch.filter(_.datum.status ==
          graft.schemas.CrawlStatus.FETCH_SUCCESS).count(),
        crawldb.read().count())
    }

    val hostdb = UpdateHostDb(crawldb.read(),
      spark.emptyDataset[UpdateHostDb.HostRow],
      cfg.startTime + cfg.rounds * cfg.roundMillis)

    val indexed =
      if (cfg.index && segments.nonEmpty) {
        val fetchAll = segments.map(_.fetch).reduce(_ union _)
        val pdAll = segments.map(_.parseData).reduce(_ union _)
        val ptAll = segments.map(_.parseText).reduce(_ union _)
        Index(crawldb.read(), fetchAll, pdAll, ptAll, linkdb.read(),
          Index.Config()).count()
      } else 0L

    Summary(stats, indexed, hostdb.count())
  }
}
