package graft.ops

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import graft.schemas.{Outlink, ParseStatusCodes}

/** parse-zip analog (ZipParser.java:57-110 + ZipTextExtractor.java:62-115):
  * walk the archive's members, feed each named member back through the
  * parse gate as a sub-document at `url/member-name`, concatenate
  * `"name text "` per member, and merge member outlinks. Nested zips
  * expand recursively up to `maxDepth` (the reference recurses
  * implicitly through ParseUtil re-dispatch; the explicit cap is the
  * zip-bomb guard a 100 TB crawl needs). Members without a filename
  * extension are skipped (ZipTextExtractor.java:84: `lastIndexOf('.')
  * == -1` → no parse), directories likewise.
  *
  * Truncation: a declared content length that disagrees with the actual
  * byte count fails the parse up front (ZipParser.java:72-78
  * FAILED_TRUNCATED — an incomplete zip cannot be walked safely). */
object ZipParse {

  /** Extension → mime for member dispatch (the reference asks Tika by
    * filename; this is the name-only subset for the types the parse gate
    * handles plus the archive/doc types it reports). */
  private val extMime = Map(
    "html" -> "text/html", "htm" -> "text/html", "txt" -> "text/plain",
    "csv" -> "text/csv", "md" -> "text/plain", "xml" -> "application/xml",
    "json" -> "application/json", "pdf" -> "application/pdf",
    "rtf" -> "application/rtf",
    "doc" -> "application/msword",
    "xls" -> "application/vnd.ms-excel",
    "ppt" -> "application/vnd.ms-powerpoint",
    "odt" -> "application/vnd.oasis.opendocument.text",
    "docx" -> ("application/vnd.openxmlformats-officedocument" +
      ".wordprocessingml.document"),
    "xlsx" -> ("application/vnd.openxmlformats-officedocument" +
      ".spreadsheetml.sheet"),
    "zip" -> "application/zip")

  def contentTypeOf(name: String): Option[String] = {
    val i = name.lastIndexOf('.')
    if (i < 0) None
    else Some(extMime.getOrElse(name.substring(i + 1).toLowerCase,
      "application/octet-stream"))
  }

  final case class Result(status: Int, text: String,
      outlinks: Seq[Outlink], nMembers: Int)

  /** Parse a zip payload. `declaredLength` mirrors the reference's
    * Content-Length truncation check; pass None to skip it. */
  def parse(url: String, bytes: Array[Byte],
      declaredLength: Option[Long] = None,
      cfg: Parse.Config = Parse.Config(),
      maxDepth: Int = 1, maxMembers: Int = 1000,
      maxMemberBytes: Int = 10 << 20): Result = {
    if (declaredLength.exists(_ != bytes.length))
      return Result(ParseStatusCodes.Failed, "", Nil, 0)
    val text = new StringBuilder
    val links = Vector.newBuilder[Outlink]
    var members = 0
    var budget = maxMembers

    def walk(baseUrl: String, zipBytes: Array[Byte], depth: Int): Unit = {
      val zin = new ZipInputStream(new ByteArrayInputStream(zipBytes))
      try {
        var entry = zin.getNextEntry
        while (entry != null && budget > 0) {
          if (!entry.isDirectory) {
            contentTypeOf(entry.getName).foreach { ct =>
              val body = readLimited(zin, maxMemberBytes)
              val memberUrl = s"$baseUrl/${entry.getName}"
              budget -= 1
              if (ct == "application/zip") {
                if (depth < maxDepth) {
                  text.append(entry.getName).append(' ')
                  walk(memberUrl, body, depth + 1)
                }
                // deeper than the cap: the container is not expanded
              } else {
                val (st, _, memberText, memberLinks) =
                  Parse.parsePage(memberUrl, body, ct, cfg)
                members += 1
                text.append(entry.getName).append(' ')
                if (st == ParseStatusCodes.Success) {
                  if (memberText.nonEmpty) text.append(memberText).append(' ')
                  links ++= memberLinks
                }
              }
            }
          }
          zin.closeEntry()
          entry = zin.getNextEntry
        }
      } catch {
        case _: java.io.IOException | _: IllegalArgumentException => ()
        // a corrupt tail stops the walk; members seen so far survive
      } finally zin.close()
    }

    try walk(url, bytes, 0)
    catch { case _: Exception => return Result(ParseStatusCodes.Failed, "", Nil, 0) }
    Result(ParseStatusCodes.Success, text.toString.trim,
      links.result(), members)
  }

  private def readLimited(in: java.io.InputStream, limit: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(8192)
    val buf = new Array[Byte](8192)
    var remaining = limit
    var n = 0
    while (remaining > 0 &&
      { n = in.read(buf, 0, math.min(buf.length, remaining)); n >= 0 }) {
      out.write(buf, 0, n)
      remaining -= n
    }
    out.toByteArray
  }

  /** Deterministic zip fixture builder for oracle queries and specs. */
  def build(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    entries.foreach { case (name, body) =>
      val e = new java.util.zip.ZipEntry(name)
      e.setTime(0L) // fixed timestamp: byte-stable output
      zos.putNextEntry(e)
      if (!name.endsWith("/")) zos.write(body)
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }
}
