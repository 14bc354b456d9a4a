package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.schemas.{ContentRow, CrawlRow, CrawlStatus}

/** S9 — the WARC exporter (WARCExporter.java:180-420): cogroup the
  * segment's crawl_fetch datums with their content, and emit full
  * WARC/1.0 record PAIRS — a `request` record (the synthesized GET) and
  * the `response` record carrying the HTTP header block + payload
  * bytes, linked via WARC-Concurrent-To. Record IDs are deterministic
  * UUIDs derived from md5(url|kind) and WARC-Date comes from the
  * datum's fetchTime, so exports are reproducible bit-for-bit.
  *
  * Records are produced as byte arrays (WARC payloads are binary); the
  * local writer concatenates one .warc file per partition — a shared-FS
  * deployment swaps in a Hadoop OutputFormat behind the same record
  * stream. */
object WarcExporter {

  final case class WarcRecord(url: String, kind: String, bytes: Array[Byte])

  private val CRLF = "\r\n"

  /** Deterministic urn:uuid from the url+kind (WARCExporter uses random
    * UUIDs; determinism is what makes the export testable/oracle-able). */
  def recordId(url: String, kind: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$kind|$url".getBytes(StandardCharsets.UTF_8))
    val bb = java.nio.ByteBuffer.wrap(d)
    s"<urn:uuid:${new java.util.UUID(bb.getLong, bb.getLong)}>"
  }

  def warcDate(epochMs: Long): String =
    java.time.Instant.ofEpochMilli(epochMs).toString
      .replaceAll("\\.\\d+Z$", "Z")

  private def record(headers: Seq[(String, String)],
      payload: Array[Byte]): Array[Byte] = {
    val head = new StringBuilder("WARC/1.0").append(CRLF)
    headers.foreach { case (k, v) => head.append(k).append(": ")
      .append(v).append(CRLF) }
    head.append("Content-Length: ").append(payload.length).append(CRLF)
    head.append(CRLF)
    val hb = head.toString.getBytes(StandardCharsets.UTF_8)
    val out = new Array[Byte](hb.length + payload.length + 4)
    System.arraycopy(hb, 0, out, 0, hb.length)
    System.arraycopy(payload, 0, out, hb.length, payload.length)
    // record terminator: CRLF CRLF
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** request+response record pair per successfully fetched page. */
  def records(fetch: Dataset[CrawlRow], content: Dataset[ContentRow],
      agent: String = "graft"): Dataset[WarcRecord] = {
    val spark: SparkSession = fetch.sparkSession
    import spark.implicits._
    val ok = fetch.filter(_.datum.status == CrawlStatus.FETCH_SUCCESS)
      .map(r => (r.url, r.datum.fetchTime))
      .toDF("url", "fetch_time")
    content.toDF()
      .join(ok, "url")
      .select("url", "bytes", "contentType", "fetch_time")
      .as[(String, Array[Byte], String, Long)]
      .flatMap { case (url, bytes, ct, ft) =>
        val date = warcDate(ft)
        val host = graft.net.UrlParts.host(url).getOrElse("")
        val path = url.replaceFirst("^[a-z]+://[^/]+", "") match {
          case "" => "/"; case p => p
        }
        val reqId = recordId(url, "request")
        val respId = recordId(url, "response")
        val reqHttp =
          (s"GET $path HTTP/1.1" + CRLF +
            s"Host: $host" + CRLF +
            s"User-Agent: $agent" + CRLF + CRLF)
            .getBytes(StandardCharsets.UTF_8)
        val req = record(Seq(
          "WARC-Type" -> "request",
          "WARC-Date" -> date,
          "WARC-Record-ID" -> reqId,
          "WARC-Target-URI" -> url,
          "WARC-Concurrent-To" -> respId,
          "Content-Type" -> "application/http; msgtype=request"), reqHttp)
        val respHttp =
          ("HTTP/1.1 200 OK" + CRLF +
            s"Content-Type: $ct" + CRLF +
            s"Content-Length: ${bytes.length}" + CRLF + CRLF)
            .getBytes(StandardCharsets.UTF_8)
        val payload = new Array[Byte](respHttp.length + bytes.length)
        System.arraycopy(respHttp, 0, payload, 0, respHttp.length)
        System.arraycopy(bytes, 0, payload, respHttp.length, bytes.length)
        val resp = record(Seq(
          "WARC-Type" -> "response",
          "WARC-Date" -> date,
          "WARC-Record-ID" -> respId,
          "WARC-Target-URI" -> url,
          "WARC-Concurrent-To" -> reqId,
          "WARC-Payload-Digest" -> ("md5:" + md5Hex(bytes)),
          "Content-Type" -> "application/http; msgtype=response"), payload)
        Seq(WarcRecord(url, "request", req), WarcRecord(url, "response", resp))
      }
  }

  def md5Hex(b: Array[Byte]): String = graft.functions.Hashing.md5HexOf(b)

  /** Concatenate records into one .warc file per partition under `dir`
    * (local-FS writer for the sandbox; record order within a partition
    * is url-sorted for determinism). */
  def writeLocal(records: Dataset[WarcRecord], dir: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    records.sort("url", "kind").foreachPartition {
      (it: Iterator[WarcRecord]) =>
        // open lazily on the first record and write straight from the
        // iterator — never buffer a partition of page payloads in memory
        if (it.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val p = java.nio.file.Paths.get(dir, f"part-$pid%05d.warc")
          val out = java.nio.file.Files.newOutputStream(p)
          try it.foreach(r => out.write(r.bytes))
          finally out.close()
        }
    }
  }
}
