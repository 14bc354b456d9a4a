package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.schemas.{ContentRow, CrawlRow, CrawlStatus}

/** S10 — CommonCrawl-format dump, full records
  * (AbstractCommonCrawlFormat.java:99-160 field layout +
  * CommonCrawlDataDumper key reversal): one JSON object per
  * successfully fetched page with url, epoch timestamp, a request
  * envelope (method/client/headers), a response envelope
  * (status/headers/base64 body — binary-safe), and the reversed-domain
  * key (`com.example.www:http/path`) the dumper shards by.
  *
  * Built with deterministic hand-assembled JSON (like the repo's other
  * sinks) so records are byte-stable across runs. */
object CommonCrawlDumper {

  /** TableUtil-style reversed url key:
    * `http://www.example.com/p?q` → `com.example.www:http/p?q`. */
  def reverseUrlKey(url: String): String = {
    val m = "^([a-z][a-z0-9+.-]*)://([^/?#]+)(.*)$".r
    url match {
      case m(scheme, authority, rest) =>
        val host = authority.takeWhile(_ != ':')
        val port = authority.drop(host.length) // ":8080" or ""
        val revHost = host.split('.').reverse.mkString(".")
        s"$revHost$port:$scheme$rest"
      case _ => url
    }
  }

  /** Full-record JSON lines for every successfully fetched page. */
  def records(fetch: Dataset[CrawlRow], content: Dataset[ContentRow],
      agent: String = "graft"): Dataset[String] = {
    val spark: SparkSession = fetch.sparkSession
    import spark.implicits._
    val ok = fetch.filter(_.datum.status == CrawlStatus.FETCH_SUCCESS)
      .map(r => (r.url, r.datum.fetchTime))
      .toDF("url", "fetch_time")
    content.toDF().join(ok, "url")
      .select("url", "bytes", "contentType", "fetch_time")
      .as[(String, Array[Byte], String, Long)]
      .map { case (url, bytes, ct, ft) =>
        val host = graft.net.UrlParts.host(url).getOrElse("")
        val body = java.util.Base64.getEncoder
          .encodeToString(if (bytes == null) Array.empty[Byte] else bytes)
        val sb = new StringBuilder(256 + body.length)
        sb.append("{\"url\":").append(graft.Json.str(url))
          .append(",\"timestamp\":").append(ft)
          .append(",\"key\":").append(graft.Json.str(reverseUrlKey(url)))
          .append(",\"request\":{\"method\":\"GET\",\"client\":{")
          .append("\"hostname\":\"localhost\",\"software\":")
          .append(graft.Json.str(s"graft ($agent)"))
          .append("},\"headers\":{\"User-Agent\":").append(graft.Json.str(agent))
          .append(",\"Accept\":\"*/*\"}}")
          .append(",\"response\":{\"status\":200,\"server\":{\"hostname\":")
          .append(graft.Json.str(host))
          .append("},\"headers\":{\"Content-Type\":").append(graft.Json.str(ct))
          .append(",\"Content-Length\":\"")
          .append(if (bytes == null) 0 else bytes.length)
          .append("\"},\"body\":").append(graft.Json.str(body)).append("}}")
        sb.toString
      }
  }

  def write(fetch: Dataset[CrawlRow], content: Dataset[ContentRow],
      outDir: String, agent: String = "graft"): Unit =
    records(fetch, content, agent).toDF("value")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).text(outDir)
}
