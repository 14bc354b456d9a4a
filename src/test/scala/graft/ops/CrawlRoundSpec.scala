package graft.ops

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.crawl.{DefaultFetchSchedule, ScheduleConfig, UpdateDb}
import graft.net.RegexUrlFilter
import graft.schemas.{CrawlRow, CrawlStatus => S}
import graft.tables.{CrawlDbTable, LinkDbTable, Segment}

/** End-to-end mini crawl over the table layer (SURVEY §7.2 slice):
  * inject → generate → fetch (mock protocol) → parse → updatedb →
  * invertlinks → index, two rounds, with row-level asserts on every
  * stage. The mock site has an external link, duplicate content, a gone
  * page, and a permanent redirect — the cases the reference's
  * fetch-test-site fixture exercises (FIXTURES §A4). */
class CrawlRoundSpec extends AnyFunSuite with SparkSuite {

  private val A = "http://site-a.example.com"
  private val B = "http://site-b.example.com"

  private val site = Map(
    s"$A/" -> (Fetch.Code.Success,
      s"""<html><title>A home</title><body>Welcome to site A.
         |<a href="/page1">one</a> <a href="/page2">two</a>
         |<a href="$B/">other site</a></body></html>""".stripMargin,
      "text/html"),
    s"$A/page1" -> (Fetch.Code.Success,
      "<html><title>P</title><body>shared body text</body></html>",
      "text/html"),
    s"$A/page2" -> (Fetch.Code.Success, // same visible text as page1
      "<html><title>P</title><body>shared body text</body></html>",
      "text/html"),
    s"$B/" -> (Fetch.Code.Success,
      s"""<html><title>B home</title><body>Site B.
         |<a href="/gone">dead</a> <a href="/redir">moved</a></body></html>""".stripMargin,
      "text/html"),
    s"$B/gone" -> (Fetch.Code.Gone, "", ""),
    s"$B/redir" -> (Fetch.Code.MovedPerm, "", ""))

  private val protocol = Fetch.MockProtocol(site,
    redirects = Map(s"$B/redir" -> s"$B/moved-here"))

  private val acceptAll = RegexUrlFilter.parse(Iterator("+."))
  private val schedCfg = ScheduleConfig()
  private val schedule = DefaultFetchSchedule(schedCfg)
  private val t0 = 1700000000000L

  test("two full crawl rounds over the table layer") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-crawl").toString
    val crawldb = new CrawlDbTable(spark, s"$root/crawldb")
    val linkdb = new LinkDbTable(spark, s"$root/linkdb")

    // ---- inject ----
    val seeds = spark.createDataset(Seq(
      "# seed list",
      s"$A/\tnutch.score=2.0",
      s"$B/"))
    val db0 = Inject(crawldb.read(), seeds, Inject.Config(), acceptAll, t0)
    crawldb.install(db0, "r0")
    val injected = crawldb.read().collect().map(r => r.url -> r.datum).toMap
    assert(injected.keySet == Set(s"$A/", s"$B/"))
    assert(injected(s"$A/").status == S.DB_UNFETCHED)
    assert(injected(s"$A/").score == 2.0f) // nutch.score honored
    assert(injected(s"$B/").score == 1.0f) // db.score.injected default

    // ---- round 1: generate / fetch / parse / updatedb ----
    val seg1 = new Segment(spark, s"$root/segments/r1")
    val fl1 = Generate(crawldb.read(),
      Generate.Config(curTime = t0, segnum = 1), schedule)
    seg1.writeGenerate(fl1)
    assert(seg1.generate.count() == 2) // both seeds due

    val now1 = t0 + 1000
    val fr1 = Fetch(seg1.generate, protocol, now1,
      pacer = graft.net.Pacer.Config(serverDelayMs = 0))
    seg1.writeFetch(fr1.fetch); seg1.writeContent(fr1.content); fr1.release()
    assert(seg1.fetch.collect()
      .forall(_.datum.status == S.FETCH_SUCCESS))

    val p1 = Parse(seg1.fetch, seg1.content, Parse.Config(), acceptAll)
    seg1.writeParseData(p1.parseData); seg1.writeParseText(p1.parseText)
    seg1.writeCrawlParse(p1.crawlParse)
    val pd1 = seg1.parseData.collect()
    val outlinksA = pd1.find(_.url == s"$A/").get.outlinks
    assert(outlinksA.map(_.toUrl).toSet ==
      Set(s"$A/page1", s"$A/page2", s"$B/")) // relative hrefs resolved
    assert(seg1.parseText.collect().find(_.url == s"$A/").get
      .text.contains("Welcome to site A."))

    val db1 = UpdateDb(
      crawldb.read().union(seg1.fetch).union(seg1.crawlParse),
      now1, schedule)
    crawldb.install(db1, "r1")
    val after1 = crawldb.read().collect().map(r => r.url -> r.datum).toMap
    assert(after1(s"$A/").status == S.DB_FETCHED)
    assert(after1(s"$A/").signature.isDefined)
    assert(after1(s"$A/page1").status == S.DB_UNFETCHED) // discovered
    assert(after1(s"$B/gone").status == S.DB_UNFETCHED)
    // B root got A's outlink cash on top of its injected score (OPIC)
    assert(after1(s"$B/").score > 1.0f)

    // ---- linkdb: only the external A→B link survives the invert ----
    val ldb1 = InvertLinks(seg1.parseData, linkdb.read(),
      InvertLinks.Config())
    linkdb.install(ldb1, "r1")
    val inlinks = linkdb.read().collect().map(r => r.url -> r.inlinks).toMap
    assert(inlinks.keySet == Set(s"$B/")) // internal links ignored
    assert(inlinks(s"$B/").map(_.fromUrl) == Seq(s"$A/"))
    assert(inlinks(s"$B/").head.anchor == "other site")

    // ---- round 2 ----
    val fl2 = Generate(crawldb.read(),
      Generate.Config(curTime = now1 + 1000, segnum = 2), schedule)
    val due2 = fl2.collect().map(_.url).toSet
    // roots are scheduled a month out; only the discovered pages are due
    assert(due2 == Set(s"$A/page1", s"$A/page2", s"$B/gone", s"$B/redir"))

    val seg2 = new Segment(spark, s"$root/segments/r2")
    seg2.writeGenerate(fl2)
    val now2 = now1 + 2000
    val fr2 = Fetch(seg2.generate, protocol, now2,
      pacer = graft.net.Pacer.Config(serverDelayMs = 0))
    seg2.writeFetch(fr2.fetch); seg2.writeContent(fr2.content); fr2.release()
    val f2 = seg2.fetch.collect().map(r => r.url -> r.datum).toMap
    assert(f2(s"$B/gone").status == S.FETCH_GONE)
    assert(f2(s"$B/redir").status == S.FETCH_REDIR_PERM)
    assert(f2(s"$B/redir").metadata.get("_repr_").contains(s"$B/moved-here"))

    val p2 = Parse(seg2.fetch, seg2.content, Parse.Config(), acceptAll)
    seg2.writeParseData(p2.parseData); seg2.writeParseText(p2.parseText)
    seg2.writeCrawlParse(p2.crawlParse)

    val db2 = UpdateDb(
      crawldb.read().union(seg2.fetch).union(seg2.crawlParse),
      now2, schedule)
    crawldb.install(db2, "r2")
    val after2 = crawldb.read().collect().map(r => r.url -> r.datum).toMap
    assert(after2(s"$B/gone").status == S.DB_GONE)
    assert(after2(s"$B/redir").status == S.DB_REDIR_PERM)
    assert(after2(s"$B/redir").signature.isEmpty) // NUTCH-1422
    // the redirect target was emitted as LINKED and is now discovered
    assert(after2(s"$B/moved-here").status == S.DB_UNFETCHED)
    // duplicate content: page1/page2 share the parse-text signature
    assert(after2(s"$A/page1").signature.isDefined)
    assert(after2(s"$A/page1").signature == after2(s"$A/page2").signature)
    // copy-on-write: previous generation still readable at old/
    assert(Files.exists(java.nio.file.Paths.get(s"$root/crawldb/old")))

    // ---- index ----
    val docs = Index(crawldb.read(),
      seg1.fetch.union(seg2.fetch),
      p1.parseData.union(p2.parseData),
      p1.parseText.union(p2.parseText),
      linkdb.read(), Index.Config(deleteGone = true))
      .collect().map(d => d.url -> d).toMap
    assert(docs(s"$A/").action == "add")
    assert(docs(s"$A/").title == "A home")
    assert(docs(s"$B/").anchors == Seq("other site"))
    assert(docs(s"$B/gone").action == "delete")
    assert(!docs.contains(s"$B/redir") || docs(s"$B/redir").action == "delete")

    // index-jexl-filter: the JEXL doc gate over the assembled documents
    val jdocs = Index(crawldb.read(),
      seg1.fetch.union(seg2.fetch),
      p1.parseData.union(p2.parseData),
      p1.parseText.union(p2.parseText),
      linkdb.read(), Index.Config(deleteGone = true,
        jexlFilter = Some("action == 'add' && host == 'site-a.example.com'")))
      .collect().map(_.url).toSet
    assert(jdocs == docs.collect { case (u, d)
      if d.action == "add" && d.host == "site-a.example.com" => u }.toSet)
    assert(jdocs.contains(s"$A/"))
  }

  test("Fetch.toSegment (stream-to-parquet) matches the cached path") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-tosegment").toString
    val fl = Seq(
      graft.schemas.GenerateEntry(1, 1f, s"$A/",
        graft.schemas.CrawlDatum(S.DB_UNFETCHED, t0, 0, 2592000, 1f, None,
          0L, Map.empty)),
      graft.schemas.GenerateEntry(1, 1f, s"$B/gone",
        graft.schemas.CrawlDatum(S.DB_UNFETCHED, t0, 0, 2592000, 1f, None,
          0L, Map.empty)),
      graft.schemas.GenerateEntry(1, 1f, s"$B/redir",
        graft.schemas.CrawlDatum(S.DB_UNFETCHED, t0, 0, 2592000, 1f, None,
          0L, Map.empty))).toDS()

    // cached path
    val fr = Fetch(fl, protocol, t0,
      pacer = graft.net.Pacer.Config(serverDelayMs = 0))
    val cachedFetch = fr.fetch.collect().map(r => r.url -> r.datum.status)
      .sortBy(_._1).toSeq
    val cachedContent = fr.content.collect().map(_.url).sorted.toSeq
    fr.release()

    // streamed path: one write, tables derived from the staged file
    val seg = new Segment(spark, s"$root/seg")
    Fetch.toSegment(fl, protocol, t0, seg,
      pacer = graft.net.Pacer.Config(serverDelayMs = 0))
    assert(seg.fetch.collect().map(r => r.url -> r.datum.status)
      .sortBy(_._1).toSeq == cachedFetch)
    assert(seg.content.collect().map(_.url).sorted.toSeq == cachedContent)
    // payload bytes survive the staging round-trip
    val body = seg.content.collect().find(_.url == s"$A/").get
    assert(new String(body.bytes, "UTF-8").contains("Welcome to site A."))
    // the staging file is cleaned up after derivation
    assert(!Files.exists(java.nio.file.Paths.get(s"${seg.dir}/fetch_staged")))
  }

  test("robots.txt denies are honored before the protocol is hit") {
    import spark.implicits._
    val robotsSite = site ++ Map(
      s"$A/robots.txt" -> (Fetch.Code.Success,
        "User-agent: *\nDisallow: /page1\n", "text/plain"))
    val proto = Fetch.MockProtocol(robotsSite)
    val fl = Seq(
      graft.schemas.GenerateEntry(1, 1f, s"$A/page1",
        graft.schemas.CrawlDatum(S.DB_UNFETCHED, t0, 0, 2592000, 1f, None,
          0L, Map.empty)),
      graft.schemas.GenerateEntry(1, 1f, s"$A/page2",
        graft.schemas.CrawlDatum(S.DB_UNFETCHED, t0, 0, 2592000, 1f, None,
          0L, Map.empty))).toDS()
    val graft.ops.Fetch.Result(f, c, rel) = Fetch(fl, proto, t0,
      pacer = graft.net.Pacer.Config(serverDelayMs = 0))
    val statuses = f.collect().map(r => r.url -> r.datum).toMap
    assert(statuses(s"$A/page1").status == S.FETCH_GONE)
    assert(statuses(s"$A/page1").metadata.contains(Fetch.RobotsDeniedKey))
    assert(statuses(s"$A/page2").status == S.FETCH_SUCCESS)
    assert(c.collect().map(_.url).toSeq == Seq(s"$A/page2"))
  }

  test("adaptive schedule grows the interval on unchanged content") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-adaptive").toString
    val crawldb = new CrawlDbTable(spark, s"$root/crawldb")
    val adaptive = graft.crawl.AdaptiveFetchSchedule(schedCfg)
    val url = s"$A/page1"

    val db0 = Inject(crawldb.read(),
      spark.createDataset(Seq(url)), Inject.Config(), acceptAll, t0)
    crawldb.install(db0, "r0")

    def round(now: Long): Unit = {
      val seg = new Segment(spark,
        s"$root/segments/${now}")
      seg.writeGenerate(Generate(crawldb.read(),
        Generate.Config(curTime = now), adaptive))
      val fr = Fetch(seg.generate, protocol, now,
        pacer = graft.net.Pacer.Config(serverDelayMs = 0))
      seg.writeFetch(fr.fetch); seg.writeContent(fr.content); fr.release()
      val p = Parse(seg.fetch, seg.content, Parse.Config(), acceptAll)
      seg.writeCrawlParse(p.crawlParse)
      crawldb.install(UpdateDb(
        crawldb.read().union(seg.fetch).union(seg.crawlParse),
        now, adaptive), s"r$now")
    }

    round(t0)
    val d1 = crawldb.read().collect().head.datum
    assert(d1.status == S.DB_FETCHED)
    val firstInterval = d1.fetchInterval

    // refetch when due: identical content → notmodified by signature
    // (NUTCH-1341) → adaptive interval grows by inc_rate
    round(d1.fetchTime)
    val d2 = crawldb.read().collect().head.datum
    assert(d2.status == S.DB_NOTMODIFIED)
    assert(d2.signature == d1.signature)
    assert(d2.fetchInterval > firstInterval,
      s"interval ${d2.fetchInterval} did not grow from $firstInterval")
  }

  test("bucketed CrawlDb layout: conductor A/B identical, join Exchange-free") {
    import org.apache.spark.sql.functions.col
    import graft.plugins.Extensions
    val A = "http://bk-a.example.com"
    // second host: cross-host links survive db.ignore.internal.links, so
    // the A/B below also exercises a NON-EMPTY linkdb in both layouts
    val B = "http://bk-b.example.com"
    val site = Map(
      s"$A/" -> (Fetch.Code.Success,
        """<html><title>A</title><body><a href="/p1">p1</a>
          |<a href="/p2">p2</a></body></html>""".stripMargin, "text/html"),
      s"$A/p1" -> (Fetch.Code.Success,
        "<html><title>P1</title><body>one</body></html>", "text/html"),
      s"$A/p2" -> (Fetch.Code.Success,
        "<html><title>P2</title><body>two</body></html>", "text/html"),
      s"$B/" -> (Fetch.Code.Success,
        s"""<html><title>B</title><body><a href="$A/p1">ap1</a>
           |<a href="$A/p2">ap2</a></body></html>""".stripMargin,
        "text/html"))
    val seeds = Seq(s"$A/", s"$B/")
    val registry = Extensions.Registry(
      urlFilters = Seq(RegexUrlFilter.parse(Iterator("+."))))
    def runIt(buckets: Option[Int]): (String, Crawl.Summary) = {
      val root = Files.createTempDirectory("crawl-ab").toString
      val s = Crawl.run(spark, root, seeds,
        Fetch.MockProtocol(site), registry,
        Crawl.Config(rounds = 2, buckets = buckets,
          pacer = graft.net.Pacer.Config(serverDelayMs = 0)))
      (root, s)
    }
    val (plainRoot, plainSum) = runIt(None)
    val (bRoot, bSum) = runIt(Some(8))

    // byte-identical rounds and final db between the two layouts
    assert(bSum == plainSum)
    def dump(store: graft.tables.CrawlDbStore) =
      store.read().collect().map(r => r.url -> r.datum).toMap
    val plainDb = dump(new graft.tables.CrawlDbTable(
      spark, s"$plainRoot/crawldb"))
    val bDb = dump(new graft.tables.BucketedCrawlDbTable(
      spark, s"$bRoot/crawldb", 8))
    assert(bDb == plainDb)

    // the LinkDb is bucketed alongside the CrawlDb (r10): byte-identical
    // content between the layouts, and the bucketed run really wrote
    // the generation-pointer layout with the crawldb's count
    def dumpLinks(store: graft.tables.LinkDbStore) =
      store.read().collect()
        .map(r => r.url -> r.inlinks.sortBy(i => (i.fromUrl, i.anchor)))
        .toMap
    val plainLinks = dumpLinks(new graft.tables.LinkDbTable(
      spark, s"$plainRoot/linkdb"))
    val bLinkStore = graft.tables.LinkDbStore.open(spark, s"$bRoot/linkdb")
    assert(bLinkStore.isInstanceOf[graft.tables.BucketedLinkDbTable])
    assert(bLinkStore.asInstanceOf[graft.tables.BucketedLinkDbTable]
      .buckets == 8)
    assert(dumpLinks(bLinkStore) == plainLinks)
    assert(plainLinks.nonEmpty)

    // migration path (bucketed is the conductor default since r9): one
    // round plain, then a bucketed run resumes the same root — the
    // plain current is rewritten as generation 1 and round 2 continues
    // on it; final db byte-identical to both straight 2-round runs
    val migRoot = Files.createTempDirectory("crawl-mig").toString
    val cfg1 = Crawl.Config(rounds = 1, buckets = None,
      pacer = graft.net.Pacer.Config(serverDelayMs = 0))
    Crawl.run(spark, migRoot, seeds, Fetch.MockProtocol(site),
      registry, cfg1)
    assert(Files.exists(
      java.nio.file.Paths.get(migRoot, "crawldb", "current")))
    Crawl.run(spark, migRoot, seeds, Fetch.MockProtocol(site),
      registry, cfg1.copy(buckets = Some(8),
        startTime = cfg1.startTime + cfg1.roundMillis)) // round 2's clock
    assert(!Files.exists(
      java.nio.file.Paths.get(migRoot, "crawldb", "current")))
    assert(Files.exists(
      java.nio.file.Paths.get(migRoot, "crawldb", "GENERATION")))
    val migDb = dump(new graft.tables.BucketedCrawlDbTable(
      spark, s"$migRoot/crawldb", 8))
    assert(migDb == plainDb)

    // opting back out against a bucketed root fails loudly instead of
    // silently restarting from an empty plain db
    val ex = intercept[IllegalArgumentException] {
      Crawl.run(spark, migRoot, seeds, Fetch.MockProtocol(site),
        registry, cfg1)
    }
    assert(ex.getMessage.contains("bucketed layout"))

    // the db side of a url join over the bucketed current generation
    // plans with NO Exchange under the bucketed scan (the segment side
    // — tiny per round — is the only shuffle)
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      val db = new graft.tables.BucketedCrawlDbTable(
        spark, s"$bRoot/crawldb", 8).read().toDF()
      val seg = new graft.tables.Segment(spark, s"$bRoot/segments/r1")
        .fetch.toDF().select(col("url"), col("datum").as("fetchDatum"))
      val joined = db.join(seg, "url")
      joined.collect()
      val plan = joined.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(plan.contains("Bucketed: true"), plan)
      assert(plan.contains("SelectedBucketsCount: 8 out of 8"), plan)
      // every Exchange in the plan repartitions the SEGMENT side
      // (fetchDatum columns) into the db's 8-bucket layout; the db
      // side (datum) reads in place — no Exchange carries it
      val exchanges = plan.split("\n\n").filter(s =>
        s.contains(") Exchange"))
      assert(exchanges.nonEmpty, plan)
      assert(exchanges.forall(_.contains("fetchDatum")), plan)
      assert(exchanges.forall(_.contains("hashpartitioning(url")), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }
}
