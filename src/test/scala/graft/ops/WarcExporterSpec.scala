package graft.ops

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.schemas.{ContentRow, CrawlDatum, CrawlRow, CrawlStatus => S}

/** S9 full records: fetch ⋈ content → WARC/1.0 request+response pairs
  * with real payloads (WARCExporter.java:180-420). */
class WarcExporterSpec extends AnyFunSuite with SparkSuite {

  private val t0 = 1700000000000L
  private val url = "http://w.example.com/page"

  private def fixtures = {
    import spark.implicits._
    val body = "<html><body>warc body</body></html>"
    val fetch = Seq(
      CrawlRow(url, CrawlDatum(S.FETCH_SUCCESS, t0, 0, 0, 1f, None, 0L,
        Map.empty)),
      CrawlRow("http://w.example.com/gone", CrawlDatum(S.FETCH_GONE, t0, 0,
        0, 1f, None, 0L, Map.empty))).toDS()
    val content = Seq(
      ContentRow(url, url, body.getBytes(StandardCharsets.UTF_8),
        "text/html", Map.empty),
      ContentRow("http://w.example.com/gone", "x", Array.empty[Byte], "",
        Map.empty)).toDS()
    (fetch, content, body)
  }

  test("request+response pair, linked, with exact lengths and digest") {
    val (fetch, content, body) = fixtures
    val recs = WarcExporter.records(fetch, content).collect()
      .map(r => (r.kind, new String(r.bytes, StandardCharsets.UTF_8)))
      .toMap
    assert(recs.keySet == Set("request", "response")) // gone page skipped

    val req = recs("request")
    assert(req.startsWith("WARC/1.0\r\n"))
    assert(req.contains("WARC-Type: request"))
    assert(req.contains(s"WARC-Target-URI: $url"))
    assert(req.contains("GET /page HTTP/1.1"))
    assert(req.contains("Host: w.example.com"))

    val resp = recs("response")
    assert(resp.contains("WARC-Type: response"))
    assert(resp.contains("HTTP/1.1 200 OK"))
    assert(resp.contains(body))
    assert(resp.contains("WARC-Payload-Digest: md5:" +
      WarcExporter.md5Hex(body.getBytes(StandardCharsets.UTF_8))))
    assert(resp.contains("WARC-Date: 2023-11-14T22:13:20Z"))
    // cross-linked records with deterministic ids
    assert(req.contains("WARC-Concurrent-To: " +
      WarcExporter.recordId(url, "response")))
    assert(resp.contains("WARC-Concurrent-To: " +
      WarcExporter.recordId(url, "request")))

    // Content-Length of the response record == http headers + body
    val cl = "Content-Length: (\\d+)\r\n\r\n".r
      .findFirstMatchIn(resp).get.group(1).toInt
    val payloadStart = resp.indexOf("\r\n\r\n") + 4
    // record ends with CRLF CRLF terminator
    assert(resp.length - payloadStart - 4 == cl)
  }

  test("writeLocal produces parseable .warc part files") {
    val (fetch, content, _) = fixtures
    val dir = Files.createTempDirectory("warc").toString
    WarcExporter.writeLocal(WarcExporter.records(fetch, content), dir)
    val files = Files.list(java.nio.file.Paths.get(dir)).toArray
    assert(files.nonEmpty)
    val all = files.map(f => new String(Files.readAllBytes(
      f.asInstanceOf[java.nio.file.Path]), StandardCharsets.UTF_8)).mkString
    assert(all.split("WARC/1\\.0\r\n").count(_.nonEmpty) == 2)
  }
}
