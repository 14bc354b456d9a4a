package graft.net

import java.nio.file.{Files, Paths}

import graft.ops.Fetch
import graft.schemas.CrawlDatum

/** protocol-file analog (FileResponse.java:140-260): fetch `file:` URLs
  * from the local filesystem with the reference's HTTP-shaped status
  * mapping —
  *   - missing path → Gone (404), unreadable → Gone (401 class),
  *   - symlink/non-canonical path → redirect to the canonical form
  *     (Location, code 300 — reported, not followed, like HttpProtocol),
  *   - `lastModified <= datum.modifiedTime` → NotModified (304),
  *   - directory → a generated text/html listing with one `<a href>` per
  *     entry (list2html), so a directory tree is CRAWLABLE: the HTML
  *     parser harvests the entries as outlinks and the next round
  *     descends,
  *   - file → bytes truncated at maxContent (file.content.limit), type
  *     from magic-byte sniffing with an extension fallback (the
  *     reference delegates to Tika detect).
  * Executors read their LOCAL filesystem — on a real cluster this is the
  * shared-FS/NFS crawl case the reference plugin serves. */
final class FileProtocol(
    maxContent: Int = 1 << 20, // file.content.limit analog
    crawlParents: Boolean = false) // file.crawl.parent
  extends Fetch.Protocol {

  def fetch(url: String, datum: CrawlDatum): Fetch.ProtocolOutput = {
    val uri = java.net.URI.create(url)
    if (uri.getScheme != "file")
      return Fetch.ProtocolOutput(Fetch.Code.Retry, Array.empty, "", None)
    val p = Paths.get(uri.getPath)
    try {
      if (!Files.exists(p) || !Files.isReadable(p))
        return Fetch.ProtocolOutput(Fetch.Code.Gone, Array.empty, "", None)
      val canon = p.toRealPath()
      if (canon != p.toAbsolutePath().normalize())
        return Fetch.ProtocolOutput(Fetch.Code.MovedPerm, Array.empty, "",
          Some(canon.toUri.toString))
      val lastMod = Files.getLastModifiedTime(p).toMillis
      if (datum.modifiedTime > 0 && lastMod <= datum.modifiedTime)
        return Fetch.ProtocolOutput(Fetch.Code.NotModified, Array.empty, "",
          None)
      if (Files.isDirectory(p)) {
        val listing = dirListing(p)
        Fetch.ProtocolOutput(Fetch.Code.Success,
          listing.getBytes("UTF-8"), "text/html", None)
      } else {
        val size = math.min(Files.size(p), maxContent.toLong).toInt
        val in = Files.newInputStream(p)
        val bytes = try in.readNBytes(size) finally in.close()
        Fetch.ProtocolOutput(Fetch.Code.Success, bytes, contentType(p, bytes),
          None)
      }
    } catch {
      case _: java.io.IOException =>
        Fetch.ProtocolOutput(Fetch.Code.Retry, Array.empty, "", None)
    }
  }

  /** list2html (FileResponse.java:260+): one anchor per entry; parent
    * link only when crawlParents allows ascending. */
  private def dirListing(dir: java.nio.file.Path): String = {
    import scala.jdk.CollectionConverters._
    val entries = Files.list(dir).iterator().asScala.toSeq
      .sortBy(_.getFileName.toString)
    val rows = entries.map { e =>
      val name = e.getFileName.toString +
        (if (Files.isDirectory(e)) "/" else "")
      s"""<a href="${e.toUri}">$name</a>"""
    }
    val parent =
      if (crawlParents && dir.getParent != null)
        Seq(s"""<a href="${dir.getParent.toUri}">../</a>""")
      else Nil
    (Seq(s"<html><head><title>Index of $dir</title></head><body>") ++
      parent ++ rows ++ Seq("</body></html>")).mkString("\n")
  }

  private def contentType(p: java.nio.file.Path, bytes: Array[Byte])
      : String = {
    val sniffed = graft.operators.Multimodal.sniff(bytes)
    if (sniffed != "application/octet-stream") sniffed
    else p.getFileName.toString.toLowerCase match {
      case n if n.endsWith(".html") || n.endsWith(".htm") => "text/html"
      case n if n.endsWith(".txt") => "text/plain"
      case n if n.endsWith(".css") => "text/css"
      case n if n.endsWith(".js") => "application/javascript"
      case n if n.endsWith(".json") => "application/json"
      case n if n.endsWith(".csv") => "text/csv"
      case _ => "application/octet-stream"
    }
  }
}
