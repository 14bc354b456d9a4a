package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.operators.Multimodal
import graft.schemas.ContentRow

/** S11 — the raw file dumper (FileDumper.java:105-260): dump each
  * page's raw content to one file, filtered by (sniffed or declared)
  * MIME type, under a two-level md5(url)-prefixed directory layout so a
  * large dump never piles millions of files into one directory.
  *
  * The selection/layout runs distributed (one task writes its
  * partition's files); file naming is md5(url) + extension, matching
  * the reference's DumpFileUtil shape. */
object FileDumper {

  final case class DumpEntry(url: String, path: String, mime: String,
      nBytes: Long)

  private val extByMime = Map(
    "text/html" -> "html", "application/xml" -> "xml",
    "image/jpeg" -> "jpg", "image/png" -> "png", "image/gif" -> "gif",
    "application/pdf" -> "pdf", "audio/wav" -> "wav",
    "audio/mpeg" -> "mp3", "video/mp4" -> "mp4", "text/plain" -> "txt")

  def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  /** Effective MIME: magic-byte sniff first, declared type as fallback
    * (FileDumper trusts the stronger signal). */
  def effectiveMime(bytes: Array[Byte], declared: String): String = {
    val sniffed = Multimodal.sniff(bytes)
    if (sniffed != "application/octet-stream") sniffed
    else if (declared != null && declared.nonEmpty)
      declared.takeWhile(_ != ';').trim.toLowerCase
    else sniffed
  }

  /** Dump content rows whose MIME matches `mimeFilter` (empty = all)
    * into `outDir/<md5[0,1]>/<md5[2,3]>/<md5>.<ext>`. Returns the dump
    * manifest (what was written where). */
  def dump(content: Dataset[ContentRow], outDir: String,
      mimeFilter: Set[String] = Set.empty): Dataset[DumpEntry] = {
    val spark: SparkSession = content.sparkSession
    import spark.implicits._
    val entries = content.map { c =>
      val mime = effectiveMime(c.bytes, c.contentType)
      val h = md5Hex(c.url)
      val ext = extByMime.getOrElse(mime, "bin")
      DumpEntry(c.url,
        s"${h.substring(0, 2)}/${h.substring(2, 4)}/$h.$ext",
        mime, c.bytes.length.toLong)
    }
    val keep =
      if (mimeFilter.isEmpty) entries
      else entries.filter(e => mimeFilter.contains(e.mime))
    // write the selected payloads partition-locally
    val byUrl = content.map(c => (c.url, c.bytes))
      .toDF("url", "bytes")
    val sel = keep.toDF().join(byUrl, "url")
      .select("url", "path", "mime", "nBytes", "bytes")
      .as[(String, String, String, Long, Array[Byte])]
    sel.foreachPartition { (it: Iterator[(String, String, String, Long, Array[Byte])]) =>
      for ((_, path, _, _, bytes) <- it) {
        val p = java.nio.file.Paths.get(outDir, path)
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.write(p, bytes)
      }
    }
    keep
  }
}
