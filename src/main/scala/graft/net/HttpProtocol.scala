package graft.net

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import graft.functions.HttpDates
import graft.ops.Fetch
import graft.schemas.CrawlDatum

/** §2.4 — real-socket HTTP protocol adapter (the protocol-okhttp family:
  * OkHttp.java:468, OkHttpResponse.java:73-155), on the JDK HttpClient.
  *
  * Behavior ported:
  *   - User-Agent + If-Modified-Since (from the datum's modified time)
  *     request headers (OkHttpResponse.java:77-87).
  *   - NO transparent redirect following: 3xx is REPORTED with its
  *     Location so the fetcher's redirect logic (repr-URL choice,
  *     linked-datum emission) owns the decision, exactly like the
  *     reference protocol layer.
  *   - Content-limit truncation: the body stream is read at most
  *     `maxContent` bytes and cut there (http.content.limit;
  *     OkHttpResponse.toByteArray:157-210). A truncated page is still a
  *     SUCCESS — parse decides what to do with a cut document.
  *   - Status mapping onto the protocol majors
  *     (HttpBase.getProtocolOutput status switch): 2xx success,
  *     301/308 moved-perm, other 3xx moved-temp, 304 not-modified,
  *     4xx gone (401/403 access-denied collapse into gone — the fetch
  *     status byte is the same), 5xx + network errors retry.
  *
  * The client is per-JVM (`@transient lazy`), so broadcasting the
  * protocol ships ONLY the config — each executor builds its own
  * connection pool, the Spark analog of the reference's per-task
  * OkHttpClient array (OkHttp.java:430-440).
  *
  * No DNS/CIDR IP filtering (OkHttp.java ipFilterRules): the sandbox
  * has no resolver; the seam for it is `Resolver` in UpdateHostDb. */
final class HttpProtocol(
    agent: String = "graft",
    maxContent: Int = 1 << 20, // http.content.limit (1 MiB default analog)
    connectTimeoutMs: Int = 10000,
    requestTimeoutMs: Int = 30000,
    useIfModifiedSince: Boolean = true) extends Fetch.Protocol {

  @transient private lazy val client: HttpClient = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NEVER)
    .connectTimeout(Duration.ofMillis(connectTimeoutMs.toLong))
    .build()

  def fetch(url: String, datum: CrawlDatum): Fetch.ProtocolOutput = {
    try {
      val b = HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofMillis(requestTimeoutMs.toLong))
        .header("User-Agent", agent)
        .header("Accept", "*/*")
      if (useIfModifiedSince && datum.modifiedTime > 0)
        b.header("If-Modified-Since", HttpDates.toHttpString(datum.modifiedTime))
      val resp = client.send(b.GET().build(),
        HttpResponse.BodyHandlers.ofInputStream())
      val code = resp.statusCode()
      val contentType = resp.headers().firstValue("Content-Type").orElse("")
      val location = resp.headers().firstValue("Location")
        .map[Option[String]](l => Some(resolve(url, l))).orElse(None)
      val bytes =
        try readLimited(resp.body(), maxContent)
        finally resp.body().close()
      val major = code match {
        case c if c >= 200 && c < 300 => Fetch.Code.Success
        case 301 | 308                => Fetch.Code.MovedPerm
        case 304                      => Fetch.Code.NotModified
        case c if c >= 300 && c < 400 => Fetch.Code.MovedTemp
        case c if c >= 500            => Fetch.Code.Retry
        case _                        => Fetch.Code.Gone // 4xx incl. 401/403
      }
      val moved =
        if (major == Fetch.Code.MovedPerm || major == Fetch.Code.MovedTemp)
          location
        else None
      Fetch.ProtocolOutput(major, bytes, contentType, moved)
    } catch {
      case e @ (_: java.io.IOException | _: InterruptedException) =>
        // connect refused / reset / timeout — transient, retry later;
        // the ErrorTracker category rides along for errors_* metrics
        Fetch.ProtocolOutput(Fetch.Code.Retry, Array.empty, "", None,
          errorCategory = Some(graft.ops.Metrics.Errors.categorize(e)))
      case e: IllegalArgumentException =>
        // unparseable URL — permanently unfetchable
        Fetch.ProtocolOutput(Fetch.Code.Gone, Array.empty, "", None,
          errorCategory = Some(graft.ops.Metrics.Errors.categorize(e)))
    }
  }

  /** Read at most `limit` bytes, then stop — the socket is abandoned,
    * not drained (the truncation cancel in OkHttpResponse.java:141-147). */
  private def readLimited(in: java.io.InputStream, limit: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.min(limit, 64 * 1024))
    val buf = new Array[Byte](8192)
    var remaining = limit
    var n = 0
    while (remaining > 0 && { n = in.read(buf, 0, math.min(buf.length, remaining)); n >= 0 }) {
      out.write(buf, 0, n)
      remaining -= n
    }
    out.toByteArray
  }

  /** Resolve a (possibly relative) Location header against the request
    * URL (OkHttp's HttpUrl.resolve analog). */
  private def resolve(base: String, location: String): String =
    try URI.create(base).resolve(location.trim).toString
    catch { case _: IllegalArgumentException => location }
}
