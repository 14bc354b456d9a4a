package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.net.RegexUrlFilter
import graft.ops.{Crawl, Fetch}
import graft.plugins.Extensions

/** Batch/stream equivalence for the crawl loop: N rounds driven
  * through StreamingCrawl's micro-batch stream must leave EXACTLY the
  * state N batch conductor rounds leave — crawldb rows, linkdb rows,
  * and per-round segment contents. */
class StreamingCrawlSpec extends AnyFunSuite with SparkSuite {

  private val A = "http://stream-a.example.com"
  private val B = "http://stream-b.example.com"

  private val site = Map(
    s"$A/" -> (Fetch.Code.Success,
      s"""<html><title>A</title><body>home.
         |<a href="/p1">one</a> <a href="$B/">peer</a></body></html>"""
        .stripMargin, "text/html"),
    s"$A/p1" -> (Fetch.Code.Success,
      "<html><title>P1</title><body>page one body</body></html>",
      "text/html"),
    s"$B/" -> (Fetch.Code.Success,
      s"""<html><title>B</title><body>site b.
         |<a href="/gone">x</a></body></html>""".stripMargin, "text/html"),
    s"$B/gone" -> (Fetch.Code.Gone, "", ""))

  private val registry = Extensions.Registry(
    urlFilters = Seq(RegexUrlFilter.parse(Iterator("+."))))
  private val cfg = Crawl.Config(rounds = 2, index = false,
    metrics = false, pacer = graft.net.Pacer.Config(serverDelayMs = 0))

  test("streaming micro-batch rounds == batch conductor rounds") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val batchRoot = Files.createTempDirectory("crawl-batch").toString
    Crawl.run(spark, batchRoot, Seq(s"$A/", s"$B/"),
      Fetch.MockProtocol(site), registry, cfg)

    val streamRoot = Files.createTempDirectory("crawl-stream").toString
    val ticks = MemoryStream[Int]
    val q = StreamingCrawl.start(spark, streamRoot, Seq(s"$A/", s"$B/"),
      ticks.toDS(), Fetch.MockProtocol(site), registry, cfg)
    try {
      ticks.addData(1)
      q.processAllAvailable()
      ticks.addData(2)
      q.processAllAvailable()
    } finally q.stop()

    def db(root: String) = Crawl.openStores(spark, root, cfg)
      .crawldb.read().collect().map(r => r.url -> r.datum).toMap
    def links(root: String) = Crawl.openStores(spark, root, cfg)
      .linkdb.read().collect()
      .map(l => l.url -> l.inlinks.map(i => i.fromUrl -> i.anchor).toSet)
      .toMap
    val (bDb, sDb) = (db(batchRoot), db(streamRoot))
    assert(sDb.nonEmpty && sDb == bDb)
    assert(links(streamRoot) == links(batchRoot))

    // per-round segments byte-equal too (fetch statuses + parse text)
    for (r <- 1 to 2) {
      def seg(root: String) =
        new graft.tables.Segment(spark, s"$root/segments/r$r")
      assert(seg(streamRoot).fetch.collect().map(x => x.url -> x.datum)
        .toMap == seg(batchRoot).fetch.collect().map(x => x.url -> x.datum)
        .toMap, s"round $r fetch")
      assert(seg(streamRoot).parseText.collect().map(x => x.url -> x.text)
        .toMap == seg(batchRoot).parseText.collect()
        .map(x => x.url -> x.text).toMap, s"round $r text")
    }

    // both rounds in ONE micro-batch: ordering inside the batch is
    // ascending, so the end state is identical again
    val oneRoot = Files.createTempDirectory("crawl-stream1").toString
    val ticks2 = MemoryStream[Int]
    val q2 = StreamingCrawl.start(spark, oneRoot, Seq(s"$A/", s"$B/"),
      ticks2.toDS(), Fetch.MockProtocol(site), registry, cfg)
    try {
      ticks2.addData(1, 2)
      q2.processAllAvailable()
    } finally q2.stop()
    assert(db(oneRoot) == bDb)
  }

  test("a round that crashed mid-way re-runs to the clean state " +
    "(redelivery of a PARTIAL round is idempotent)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    // reference: the clean 2-round batch run
    val cleanRoot = Files.createTempDirectory("crash-clean").toString
    Crawl.run(spark, cleanRoot, Seq(s"$A/", s"$B/"),
      Fetch.MockProtocol(site), registry, cfg)
    val cleanDb = Crawl.openStores(spark, cleanRoot, cfg).crawldb.read()
      .collect().map(r => r.url -> r.datum).toMap

    // crash scenario: round 1 completes; round 2 "crashes" after
    // writing a partial, garbage segment (generate written, fetch
    // half-written) and BEFORE any install — then round 2 is
    // redelivered through the stream
    val root = Files.createTempDirectory("crash-mid").toString
    val ticks = MemoryStream[Int]
    val q = StreamingCrawl.start(spark, root, Seq(s"$A/", s"$B/"),
      ticks.toDS(), Fetch.MockProtocol(site), registry, cfg)
    try {
      ticks.addData(1)
      q.processAllAvailable()
      // plant the partial round-2 wreckage
      val seg2 = new graft.tables.Segment(spark, s"$root/segments/r2")
      seg2.writeGenerate(spark.createDataset(Seq(
        graft.schemas.GenerateEntry(2, 9.9f, "http://garbage.example.com/",
          graft.schemas.CrawlDatum.unfetched(0L, 3600)))))
      seg2.writeFetch(spark.createDataset(Seq(
        graft.schemas.CrawlRow("http://garbage.example.com/",
          graft.schemas.CrawlDatum.unfetched(0L, 3600)))))
      // redeliver: the db is still in round-1 state, so the re-run
      // regenerates the true fetchlist and overwrites every part
      ticks.addData(2)
      q.processAllAvailable()
    } finally q.stop()
    val gotDb = Crawl.openStores(spark, root, cfg).crawldb.read()
      .collect().map(r => r.url -> r.datum).toMap
    assert(gotDb == cleanDb)
    assert(!gotDb.contains("http://garbage.example.com/"))
    val seg2 = new graft.tables.Segment(spark, s"$root/segments/r2")
    assert(!seg2.generate.collect().exists(_.url.contains("garbage")))
  }

  test("restart across sessions: a NEW session resuming the checkpoint " +
    "never re-runs a committed round, and the final dbs stay byte-equal " +
    "to batch") {
    import spark.implicits._

    // reference: the clean 2-round batch run
    val cleanRoot = Files.createTempDirectory("restart-clean").toString
    Crawl.run(spark, cleanRoot, Seq(s"$A/", s"$B/"),
      Fetch.MockProtocol(site), registry, cfg)
    val cleanDb = Crawl.openStores(spark, cleanRoot, cfg).crawldb.read()
      .collect().map(r => r.url -> r.datum).toMap

    // a replayable, checkpointable source: one file per round tick
    val root = Files.createTempDirectory("restart-mid").toString
    val ticksDir = Files.createTempDirectory("restart-ticks").toString
    val ckpt = s"$root/.stream-checkpoint"
    def ticksOf(s: org.apache.spark.sql.SparkSession) = {
      import s.implicits._
      s.readStream.text(ticksDir).as[String].map(_.trim.toInt)
    }
    def writeTick(r: Int): Unit =
      Files.writeString(
        java.nio.file.Paths.get(ticksDir, s"round-$r.txt"), s"$r\n")

    // session 1: round 1 commits, then the "JVM dies" (stop the query)
    val seen1 = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    writeTick(1)
    val q1 = StreamingCrawl.start(spark, root, Seq(s"$A/", s"$B/"),
      ticksOf(spark), Fetch.MockProtocol(site), registry, cfg,
      onRound = seen1.add(_), checkpoint = Some(ckpt))
    try q1.processAllAvailable() finally q1.stop()
    assert(seen1.toArray.toSeq == Seq(1))

    // session 2: a fresh SessionState (new catalog — the bucketed
    // stores must re-register from disk) resumes the SAME checkpoint;
    // round 1's committed batch must NOT re-issue, only round 2 runs
    val spark2 = spark.newSession()
    val seen2 = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    writeTick(2)
    val q2 = StreamingCrawl.start(spark2, root, Seq(s"$A/", s"$B/"),
      ticksOf(spark2), Fetch.MockProtocol(site), registry, cfg,
      onRound = seen2.add(_), checkpoint = Some(ckpt))
    try q2.processAllAvailable() finally q2.stop()
    assert(seen2.toArray.toSeq == Seq(2),
      s"resumed session re-ran rounds: ${seen2.toArray.toSeq}")

    // end state byte-equal to the uninterrupted batch conductor
    val gotDb = Crawl.openStores(spark2, root, cfg).crawldb.read()
      .collect().map(r => r.url -> r.datum).toMap
    assert(gotDb == cleanDb)
    def links(s: org.apache.spark.sql.SparkSession, r: String) =
      Crawl.openStores(s, r, cfg).linkdb.read().collect()
        .map(l => l.url -> l.inlinks.map(i => i.fromUrl -> i.anchor).toSet)
        .toMap
    assert(links(spark2, root) == links(spark, cleanRoot))
  }

  test("a second query on the same root skips rounds already installed " +
    "(done markers: re-invocation is exactly-once without a checkpoint)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val cfg3 = cfg.copy(rounds = 3)

    // reference: the clean 3-round batch run
    val cleanRoot = Files.createTempDirectory("reinvoke-clean").toString
    Crawl.run(spark, cleanRoot, Seq(s"$A/", s"$B/"),
      Fetch.MockProtocol(site), registry, cfg3)
    val cleanDb = Crawl.openStores(spark, cleanRoot, cfg3).crawldb.read()
      .collect().map(r => r.url -> r.datum).toMap

    // invocation 1: rounds 1-2 install and leave done markers
    val root = Files.createTempDirectory("reinvoke").toString
    val ticks1 = MemoryStream[Int]
    val q1 = StreamingCrawl.start(spark, root, Seq(s"$A/", s"$B/"),
      ticks1.toDS(), Fetch.MockProtocol(site), registry, cfg3)
    try { ticks1.addData(1, 2); q1.processAllAvailable() } finally q1.stop()
    assert(StreamingCrawl.roundDone(root, 1) &&
      StreamingCrawl.roundDone(root, 2) && !StreamingCrawl.roundDone(root, 3))

    // invocation 2 ("crawl -stream -rounds 3" again): a FRESH query
    // with NO shared checkpoint replays ticks from 1 — exactly what the
    // CLI's rate source does on re-invocation. Committed rounds must
    // skip (the db has advanced past them), only round 3 may run.
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val ticks2 = MemoryStream[Int]
    val q2 = StreamingCrawl.start(spark, root, Seq(s"$A/", s"$B/"),
      ticks2.toDS(), Fetch.MockProtocol(site), registry, cfg3,
      onRound = r => { seen.add(r); () })
    try { ticks2.addData(1, 2, 3); q2.processAllAvailable() } finally q2.stop()
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.toSet == Set(3),
      s"re-invocation re-ran committed rounds: ${seen.asScala.toSet}")

    // end state byte-equal to the uninterrupted 3-round batch conductor
    val gotDb = Crawl.openStores(spark, root, cfg3).crawldb.read()
      .collect().map(r => r.url -> r.datum).toMap
    assert(gotDb == cleanDb)
  }
}
