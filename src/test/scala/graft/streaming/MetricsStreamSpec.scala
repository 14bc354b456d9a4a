package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.net.Pacer
import graft.ops.Fetch
import graft.schemas.{CrawlDatum, GenerateEntry}

/** The publisher→log→stream observability pipeline end-to-end: a real
  * Fetch emits START/END events through FileLogPublisher (one sealed
  * segment per task), and MetricsStream tails the directory into
  * per-minute outcome counters — the reference's
  * publish-rabbitmq→monitor shape with the broker replaced by rolled
  * segment files a Structured Streaming file source can discover. */
class MetricsStreamSpec extends AnyFunSuite with SparkSuite {

  test("fetch events stream into windowed outcome counters") {
    import spark.implicits._
    val dir = Files.createTempDirectory("metrics-stream").toString
    val host = "http://ms.example.com"
    val proto = Fetch.MockProtocol(Map(
      s"$host/a" -> (Fetch.Code.Success, "<html>a</html>", "text/html"),
      s"$host/b" -> (Fetch.Code.Success, "<html>b</html>", "text/html"),
      s"$host/c" -> (Fetch.Code.Gone, "", "text/html")))
    val t0 = 1700000000000L
    val fl = Seq("a", "b", "c").zipWithIndex.map { case (p, i) =>
      GenerateEntry(1, 1f, s"$host/$p", CrawlDatum.unfetched(t0, 30))
    }.toDS()
    val res = Fetch(fl, proto, now = t0, honorRobots = false,
      pacer = Pacer.Config(serverDelayMs = 0),
      publisher = Some(() =>
        new graft.plugins.Publishers.FileLogPublisher(dir)))
    res.fetch.collect()
    res.release()

    // segments sealed atomically: no temp files remain
    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(files.nonEmpty && files.forall(_.endsWith(".log")), files.toSeq)

    // complete mode: every window each trigger — append would hold the
    // single window open until the watermark passes it, which a
    // one-batch AvailableNow run never does
    val q = MetricsStream.fetchCounters(spark, dir)
      .writeStream.format("memory").queryName("fetchmetrics")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(60000) finally q.stop()
    val rows = spark.table("fetchmetrics").collect()
      .map(r => (r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    assert(rows(("START", "")) == 3)
    assert(rows(("END", "success")) == 2)
    assert(rows(("END", "gone")) == 1)

    // batch A/B over the same segments: identical counters
    val batch = MetricsStream.counters(
      MetricsStream.parse(spark.read.text(s"$dir/*.log"))).collect()
      .map(r => (r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    assert(batch == rows)
  }
}
