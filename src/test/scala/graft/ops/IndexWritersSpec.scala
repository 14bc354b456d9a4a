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

  test("Solr XML dialect: exact add/delete/commit request bodies") {
    // dialect framing is pure — assert the exact wire bytes first
    val d = new IndexWriters.SolrXmlDialect
    val adds = Seq(Index.Doc("http://a.com/?q=1&r=2", "add", "A <Title>",
      "a.com", "body", "d1", 2.0f, Nil))
    assert(d.frame(adds, Seq("http://gone.com/")) == Seq(
      """<add><doc><field name="id">http://a.com/?q=1&amp;r=2</field>""" +
        """<field name="title">A &lt;Title&gt;</field>""" +
        """<field name="host">a.com</field>""" +
        """<field name="digest">d1</field>""" +
        """<field name="boost">2.0</field></doc></add>""",
      "<delete><id>http://gone.com/</id></delete>"))
    assert(d.frame(Nil, Nil).isEmpty)
    assert(d.commit.contains(("/update", "<commit/>")))

    // then the full writer against a recording fixture server
    val (http, endpoint, requests) = recordingServer("/update")
    try {
      new IndexWriters.DialectBulkWriter(endpoint, d, batchSize = 10)
        .write(docs.coalesce(1), "")
      val bodies = requests()
      assert(bodies.count(_._2.startsWith("<add>")) == 1)
      assert(bodies.count(_._2.startsWith("<delete>")) == 1)
      assert(bodies.last._2 == "<commit/>")
      assert(bodies.forall(_._1 == "/update"))
      val add = bodies.find(_._2.startsWith("<add>")).get._2
      assert(add.contains("""<field name="id">http://a.com/</field>"""))
      assert(add.contains("""<field name="id">http://b.com/</field>"""))
      assert(bodies.find(_._2.startsWith("<delete>")).get._2 ==
        "<delete><id>http://c.com/</id></delete>")
    } finally http.stop(0)
  }

  test("ES _bulk dialect: action-and-metadata framing + _refresh") {
    val d = new IndexWriters.EsBulkDialect
    val adds = Seq(Index.Doc("http://a.com/", "add", "A \"quoted\"",
      "a.com", "body", "d1", 2.0f, Nil))
    assert(d.frame(adds, Seq("http://gone.com/")) == Seq(
      "{\"index\":{\"_id\":\"http://a.com/\"}}\n" +
        "{\"url\":\"http://a.com/\",\"title\":\"A \\\"quoted\\\"\"," +
        "\"host\":\"a.com\",\"digest\":\"d1\",\"boost\":2.0}\n" +
        "{\"delete\":{\"_id\":\"http://gone.com/\"}}\n"))
    assert(d.frame(Nil, Nil).isEmpty)
    assert(d.commit.contains(("/_refresh", "")))

    val (http, endpoint, requests) = recordingServer("/_bulk", "/_refresh")
    try {
      new IndexWriters.DialectBulkWriter(endpoint, d, batchSize = 10)
        .write(docs.coalesce(1), "")
      val bodies = requests()
      // one mixed ndjson body + the refresh
      val bulk = bodies.filter(_._1 == "/_bulk")
      assert(bulk.length == 1)
      val lines = bulk.head._2.linesIterator.toSeq
      assert(bulk.head._2.endsWith("\n")) // _bulk requires the trailing \n
      assert(lines.count(_.startsWith("{\"index\":")) == 2)
      assert(lines.count(_.startsWith("{\"delete\":")) == 1)
      assert(lines.contains("{\"delete\":{\"_id\":\"http://c.com/\"}}"))
      assert(bodies.last._1 == "/_refresh")
    } finally http.stop(0)
  }

  test("partitioned log writer: keyed routing, contiguous offsets, framing") {
    import spark.implicits._
    val out = Files.createTempDirectory("kafkalog").toString
    val many = (1 to 40).map(i =>
      Index.Doc(s"http://h$i.example.com/", "add", s"T$i", s"h$i.example.com",
        "", s"d$i", 1f, Nil)).toDS()
    new IndexWriters.PartitionedLogWriter(4).write(many, out)

    import scala.jdk.CollectionConverters._
    val parts = Files.list(java.nio.file.Paths.get(out)).iterator()
      .asScala.toSeq.map(_.getFileName.toString).sorted
    assert(parts.nonEmpty && parts.size <= 4)
    assert(parts.forall(_.matches("partition-[0-3]")))
    // broker-style storage: per-partition dirs of base-offset-named
    // segments; a single write batch rolls exactly one segment
    val segs = parts.map { p =>
      val fs = Files.list(java.nio.file.Paths.get(out, p)).iterator()
        .asScala.toSeq.map(_.getFileName.toString)
        .filter(_.endsWith(".log")).sorted
      assert(fs == Seq("%020d.log".format(0)), p)
      p -> fs.head
    }

    val records = segs.flatMap { case (p, f) =>
      Files.readAllLines(java.nio.file.Paths.get(out, p, f)).asScala
        .map { l =>
          val Array(off, key, json) = l.split("\t", 3)
          (p, off.toLong, key, json)
        }
    }
    // every doc lands in exactly one partition
    assert(records.map(_._3).toSet.size == 40 && records.size == 40)
    // offsets are contiguous from 0 within each partition file
    records.groupBy(_._1).foreach { case (f, rs) =>
      assert(rs.map(_._2).sorted == (0L until rs.size).toSeq, f)
    }
    // framing is the JSON-lines document shape
    assert(records.forall(r => r._4.startsWith("{\"url\":\"http://")))
    // routing is stable: a rewrite assigns every key the same partition
    val assign1 = records.map(r => r._3 -> r._1).toMap
    new IndexWriters.PartitionedLogWriter(4).write(many, out)
    val records2 = IndexWriters.PartitionedLogReader.read(spark, out)
      .collect()
      .map(r => r.getString(2) -> s"partition-${r.getInt(0)}").toMap
    assert(records2 == assign1)
  }

  /** Local fixture server recording (path, body) of each POST. */
  private def recordingServer(paths: String*)
      : (com.sun.net.httpserver.HttpServer,
         String, () => Seq[(String, String)]) = {
    val requests =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    val http = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    paths.foreach(p => http.createContext(p,
      (ex: com.sun.net.httpserver.HttpExchange) => {
        requests.add((ex.getRequestURI.getPath,
          new String(ex.getRequestBody.readAllBytes(), "UTF-8")))
        ex.sendResponseHeaders(200, -1); ex.close()
      }))
    http.start()
    (http, s"http://127.0.0.1:${http.getAddress.getPort}",
      () => { import scala.jdk.CollectionConverters._
        requests.asScala.toSeq })
  }
}
