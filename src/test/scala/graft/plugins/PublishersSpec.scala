package graft.plugins

import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.net.Pacer
import graft.ops.{Fetch, Parse}
import graft.schemas._

/** Publisher extension point: event wire shape, the publish-rabbitmq
  * HTTP analog's exact framing, and the fetch/parse lifecycle events
  * (START/END bracket the protocol call, REPORT per parsed page). */
class PublishersSpec extends AnyFunSuite with SparkSuite {

  import Publishers._

  test("FetchEvent.toJson matches the reference bean framing") {
    val e = FetchEvent(EventType.End, "http://a.com/x", 1700000000123L,
      Map("status" -> "success", "b" -> "2\n"))
    assert(e.toJson ==
      """{"eventType":"END","eventData":{"b":"2\n","status":"success"},""" +
        """"url":"http://a.com/x","timestamp":1700000000123}""")
  }

  test("HttpPublisher posts batched ndjson with routing key + static headers") {
    val got = new ConcurrentLinkedQueue[(String, String, String, String)]
    val http = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    http.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(),
        StandardCharsets.UTF_8)
      got.add((ex.getRequestURI.getPath,
        ex.getRequestHeaders.getFirst("X-Routing-Key"),
        ex.getRequestHeaders.getFirst("X-App"), body))
      ex.sendResponseHeaders(200, -1)
      ex.close()
    })
    http.start()
    try {
      val ep = s"http://127.0.0.1:${http.getAddress.getPort}"
      val pub = new HttpPublisher(ep, "fetcher_log", "fetcher.queue",
        HttpPublisher.parseHeaders("X-App=graft"), batchSize = 2)
      val es = (1 to 3).map(i =>
        FetchEvent(EventType.Start, s"http://h/$i", i.toLong, Map.empty))
      es.foreach(pub.publish)
      pub.close() // flushes the odd trailing event
      val posts = got.toArray(Array.empty[(String, String, String, String)])
      assert(posts.length == 2)
      assert(posts.forall(p => p._1 == "/fetcher_log" &&
        p._2 == "fetcher.queue" && p._3 == "graft"))
      assert(posts(0)._4 == es(0).toJson + "\n" + es(1).toJson)
      assert(posts(1)._4 == es(2).toJson)
    } finally http.stop(0)
  }

  test("fetch raises START/END around the protocol; denied URLs raise none") {
    import spark.implicits._
    val proto = Fetch.MockProtocol(
      site = Map(
        "http://ok.com/robots.txt" -> (Fetch.Code.Success, "User-agent: *\nDisallow: /private", "text/plain"),
        "http://ok.com/a" -> (Fetch.Code.Success, "<html><title>A</title></html>", "text/html"),
        "http://ok.com/b" -> (Fetch.Code.Gone, "", "text/html")))
    val fl = Seq(
      GenerateEntry(1, 1f, "http://ok.com/a", CrawlDatum.unfetched(0L, 0)),
      GenerateEntry(1, 1f, "http://ok.com/b", CrawlDatum.unfetched(0L, 0)),
      GenerateEntry(1, 1f, "http://ok.com/private/x",
        CrawlDatum.unfetched(0L, 0)))
      .toDS()
    val id = "pubspec-fetch"
    Collected.drain(id) // reset
    val res = Fetch(fl, proto, now = 1000L,
      pacer = Pacer.Config(serverDelayMs = 0),
      clockFactory = () => Pacer.SystemClock,
      publisher = Some(() => new CollectingPublisher(id)))
    res.fetch.collect()
    res.release()
    val events = Collected.drain(id)
    val byUrl = events.groupBy(_.url)
    // robots-denied page never reached the protocol → no events
    assert(!byUrl.contains("http://ok.com/private/x"))
    for ((u, status) <- Seq("http://ok.com/a" -> "success",
        "http://ok.com/b" -> "gone")) {
      val es = byUrl(u)
      assert(es.map(_.eventType) == Seq(EventType.Start, EventType.End))
      assert(es.last.data("status") == status)
    }
  }

  test("closing fires close() on partial consumption via task listener") {
    val id = "pubspec-partial"
    Collected.drain(id)
    // 1000-row single partition, but limit(1) consumes one element —
    // iterator-drain close never fires; only the TaskContext completion
    // listener can flush a buffering publisher here
    import spark.implicits._
    val got = spark.range(0, 1000, 1, 1).as[Long].mapPartitions { it =>
      val pub: Publisher = new Publisher {
        def publish(e: FetchEvent): Unit = ()
        override def close(): Unit = new CollectingPublisher(id).publish(
          FetchEvent(EventType.Report, "closed", 0L, Map.empty))
      }
      closing(it, pub)
    }.limit(1).collect()
    assert(got.length == 1)
    val events = Collected.drain(id)
    assert(events.map(_.url) == Seq("closed"),
      "close() must fire exactly once at task completion")
  }

  test("parse raises REPORT with title/score/outlinks per parsed page") {
    import spark.implicits._
    val fetch = Seq(CrawlRow("http://s.com/p",
      CrawlDatum(CrawlStatus.FETCH_SUCCESS, 777L, 0, 30, 0.5f, None, 0L,
        Map.empty))).toDS()
    val content = Seq(ContentRow("http://s.com/p", "http://s.com/p",
      "<html><title>T</title><a href=\"http://s.com/q\">q</a></html>"
        .getBytes("UTF-8"), "text/html", Map.empty)).toDS()
    val id = "pubspec-parse"
    Collected.drain(id)
    val out = Parse(fetch, content, Parse.Config(),
      outlinkFilter = graft.net.RegexUrlFilter.parse(Iterator("+.")),
      publisher = Some(() => new CollectingPublisher(id)))
    out.parseData.collect()
    val reports = Collected.drain(id)
    assert(reports.map(_.eventType) == Seq(EventType.Report))
    val r = reports.head
    assert(r.url == "http://s.com/p" && r.timestamp == 777L)
    assert(r.data("title") == "T" && r.data("score") == "0.5" &&
      r.data("outlinks") == "http://s.com/q" &&
      r.data("contentType") == "text/html")
  }
}
