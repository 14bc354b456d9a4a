package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

class IndexWritersSpec extends AnyFunSuite with SparkSuite {

  private def docs = {
    import spark.implicits._
    Seq(
      Index.Doc("http://a.com/", "add", "A", "a.com", "body a", "d1", 2.0f, Nil),
      Index.Doc("http://b.com/", "add", "B", "b.com", "body b", "d2", 0.5f, Nil),
      Index.Doc("http://c.com/", "delete", "", "c.com", "", "d3", 0f, Nil))
      .toDS()
  }

  test("exchange routing + json/csv writers") {
    import spark.implicits._
    val base = Files.createTempDirectory("writers").toString
    IndexWriters.routeAndWrite(
      docs,
      rules = Seq(
        "archive" -> (col("action") === "delete"),
        "live" -> (col("boost") >= 1.0f)),
      writers = Map(
        "archive" -> new IndexWriters.CsvWriter("archive"),
        "live" -> new IndexWriters.JsonLinesWriter("live"),
        "default" -> new IndexWriters.JsonLinesWriter("default")),
      default = "default",
      baseDir = base)

    val live = spark.read.text(s"$base/live").as[String].collect()
    assert(live.length == 1 && live.head.contains("\"url\":\"http://a.com/\""))
    val dflt = spark.read.text(s"$base/default").as[String].collect()
    assert(dflt.length == 1 && dflt.head.contains("http://b.com/"))
    val archive = spark.read.option("header", "true").csv(s"$base/archive")
    assert(archive.count() == 1)
    assert(archive.select("action").head().getString(0) == "delete")
  }

  test("CleaningJob folds gone/duplicate deletes into a json sink") {
    import spark.implicits._
    import graft.schemas.{CrawlDatum, CrawlRow, CrawlStatus => S}
    val base = Files.createTempDirectory("cleaning").toString
    // add-then-delete: index four docs …
    val four = docs.filter(col("action") === "add").union(Seq(
      Index.Doc("http://gone.com/", "add", "G", "gone.com", "x", "d4", 1f, Nil),
      Index.Doc("http://dup.com/", "add", "D", "dup.com", "x", "d5", 1f, Nil))
      .toDS())
    new IndexWriters.JsonLinesWriter().write(four, s"$base/sink")
    assert(spark.read.text(s"$base/sink").count() == 4)

    // … then the crawldb marks two of them gone/duplicate
    def row(u: String, st: Byte) =
      CrawlRow(u, CrawlDatum(st, 0L, 0, 0, 0f, None, 0L, Map.empty))
    val db = Seq(
      row("http://a.com/", S.DB_FETCHED),
      row("http://b.com/", S.DB_FETCHED),
      row("http://gone.com/", S.DB_GONE),
      row("http://dup.com/", S.DB_DUPLICATE)).toDS()

    val removed = CleaningJob.cleanJsonSink(spark, s"$base/sink",
      CleaningJob.deletes(db))
    assert(removed == 2)
    val left = spark.read.text(s"$base/sink").as[String].collect()
    assert(left.length == 2)
    assert(left.forall(l => l.contains("a.com") || l.contains("b.com")))
    // delete-action docs for downstream action-stream sinks
    assert(CleaningJob.deleteActions(db).collect()
      .map(_.url).toSet == Set("http://gone.com/", "http://dup.com/"))
  }

  test("HttpBulkWriter add-then-delete over real local HTTP") {
    import spark.implicits._
    import graft.schemas.{CrawlDatum, CrawlRow, CrawlStatus => S}
    // a mock Solr/ES: /update ingests bulk JSON lines into an index
    // keyed by url (delete actions remove), /commit counts commits
    val index = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val commits = new java.util.concurrent.atomic.AtomicInteger(0)
    val urlRe = """"url":"([^"]+)"""".r
    val actRe = """"action":"([^"]+)"""".r
    val http = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    http.createContext("/update",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        body.linesIterator.filter(_.nonEmpty).foreach { line =>
          val url = urlRe.findFirstMatchIn(line).map(_.group(1))
          val act = actRe.findFirstMatchIn(line).map(_.group(1))
          (url, act) match {
            case (Some(u), Some("delete")) => index.remove(u)
            case (Some(u), _) => index.put(u, line)
            case _ => ()
          }
        }
        ex.sendResponseHeaders(200, -1); ex.close()
      })
    http.createContext("/commit",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        commits.incrementAndGet()
        ex.sendResponseHeaders(200, -1); ex.close()
      })
    http.start()
    val endpoint = s"http://127.0.0.1:${http.getAddress.getPort}"
    try {
      val writer = new IndexWriters.HttpBulkWriter(endpoint, batchSize = 2)
      writer.write(docs.filter(col("action") === "add"), "")
      assert(index.size == 2)
      assert(index.containsKey("http://a.com/") &&
        index.containsKey("http://b.com/"))
      assert(commits.get == 1)

      // CleaningJob deletes drive removal through the same writer
      def row(u: String, st: Byte) =
        CrawlRow(u, CrawlDatum(st, 0L, 0, 0, 0f, None, 0L, Map.empty))
      val db = Seq(
        row("http://a.com/", S.DB_GONE),
        row("http://b.com/", S.DB_FETCHED)).toDS()
      writer.write(CleaningJob.deleteActions(db), "")
      assert(index.size == 1 && index.containsKey("http://b.com/"))
      assert(commits.get == 2)

      // non-2xx must throw (task retry semantics, not silent drops)
      http.createContext("/broken/update",
        (ex: com.sun.net.httpserver.HttpExchange) => {
          ex.sendResponseHeaders(500, -1); ex.close()
        })
      val bad = new IndexWriters.HttpBulkWriter(s"$endpoint/broken")
      intercept[org.apache.spark.SparkException] {
        bad.write(docs.filter(col("action") === "add"), "")
      }
    } finally http.stop(0)
  }
}
