package graft.ops

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

/** First-party office-document text extraction — the parse-tika analog
  * for the ZIP-container office family (reference samples: ootest.odt,
  * ootest.sxw, test.xlsx, test_recursive_embedded.docx; OfficeDocsSpec
  * passes the reference's own TestOOParser / TestXlsxParser
  * expectations):
  *
  *   - ODF / OpenOffice 1.x (odt/ods/odp/sxw/sxc): text of
  *     `content.xml`, tags stripped with paragraph-aware breaks,
  *     entities decoded
  *   - OOXML spreadsheet (xlsx): sheet names from `xl/workbook.xml`,
  *     then per-sheet cell values in document order — `t="s"` cells
  *     resolve through `xl/sharedStrings.xml`, `t="str"`/numeric cells
  *     read their inline `<v>`, `inlineStr` reads `<is><t>` — which
  *     reproduces Tika's "sheet name then cells" shape the reference
  *     test asserts verbatim
  *   - OOXML wordprocessing (docx): text of `word/document.xml`
  *
  * The container walk reuses the streaming zip reader (bounded member
  * size); [[Multimodal.zipContainerType]] already classifies these
  * containers — this is the text side. */
object OfficeDocs {

  private val MaxMember = 10 << 20

  /** Read selected members of a zip payload. */
  private def members(bytes: Array[Byte],
      want: String => Boolean): Map[String, Array[Byte]] = {
    val out = Map.newBuilder[String, Array[Byte]]
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      var n = 0
      while (e != null && n < 4096) {
        if (!e.isDirectory && want(e.getName)) {
          val buf = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](8192)
          var r = zin.read(tmp)
          while (r > 0 && buf.size() < MaxMember) {
            buf.write(tmp, 0, r)
            r = zin.read(tmp)
          }
          out += e.getName -> buf.toByteArray
        }
        zin.closeEntry()
        e = zin.getNextEntry
        n += 1
      }
    } catch { case _: Exception => () } // truncated zip: keep what we have
    finally zin.close()
    out.result()
  }

  /** Decode the five predefined XML entities plus numeric refs. */
  private[ops] def decodeEntities(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i)
        if (semi > i && semi - i <= 10) {
          val ent = s.substring(i + 1, semi)
          val rep: Option[String] = ent match {
            case "lt" => Some("<")
            case "gt" => Some(">")
            case "amp" => Some("&")
            case "quot" => Some("\"")
            case "apos" => Some("'")
            case _ if ent.startsWith("#x") || ent.startsWith("#X") =>
              try Some(new String(Character.toChars(
                Integer.parseInt(ent.substring(2), 16))))
              catch { case _: Exception => None }
            case _ if ent.startsWith("#") =>
              try Some(new String(Character.toChars(ent.substring(1).toInt)))
              catch { case _: Exception => None }
            case _ => None
          }
          rep match {
            case Some(r) => out.append(r); i = semi + 1
            case None => out.append(c); i += 1
          }
        } else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Strip tags from document XML: closing paragraph-ish elements and
    * explicit break elements emit newlines, any other tag boundary a
    * space (so table cells and spans never fuse words); entities
    * decode; XML declaration/comments/CDATA handled. */
  private[ops] def xmlText(xml: String): String = {
    val out = new StringBuilder
    var i = 0
    def isParaEnd(tag: String): Boolean = {
      val t = tag.toLowerCase
      t.startsWith("/text:p") || t.startsWith("/text:h") ||
        t.startsWith("/w:p") || t.startsWith("/row") ||
        t.startsWith("/table:table-row")
    }
    def isBreak(tag: String): Boolean = {
      val t = tag.toLowerCase
      t.startsWith("text:line-break") || t.startsWith("w:br") ||
        t.startsWith("br")
    }
    while (i < xml.length) {
      val c = xml.charAt(i)
      if (c == '<') {
        if (xml.startsWith("<!--", i)) {
          val e = xml.indexOf("-->", i)
          i = if (e < 0) xml.length else e + 3
        } else if (xml.startsWith("<![CDATA[", i)) {
          val e = xml.indexOf("]]>", i)
          out.append(xml.substring(i + 9, if (e < 0) xml.length else e))
          i = if (e < 0) xml.length else e + 3
        } else {
          val e = xml.indexOf('>', i)
          val tag = xml.substring(i + 1, if (e < 0) xml.length else e)
          if (isParaEnd(tag) || isBreak(tag)) out.append('\n')
          else if (out.nonEmpty && out.last != ' ' && out.last != '\n')
            out.append(' ')
          i = if (e < 0) xml.length else e + 1
        }
      } else { out.append(c); i += 1 }
    }
    decodeEntities(out.toString)
      .replaceAll("[ \t]+", " ")
      .replaceAll(" ?\n[ \n]*", "\n")
      .trim
  }

  /** ODF / OpenOffice-1.x text: content.xml of the package. */
  def extractOdf(bytes: Array[Byte]): Option[String] =
    members(bytes, _ == "content.xml").get("content.xml")
      .map(b => xmlText(new String(b, "UTF-8")))

  /** Unwrap an Ole10Native packaged file: (filename, payload). The
    * layout after the u32 size + u16 flags header is label\0,
    * filename\0, two u16s, a u32-length-prefixed temp path, then the
    * u32 payload size and the payload itself; a magic-anchored scan
    * (the u32 size immediately precedes the payload) is the fallback
    * for variant writers. */
  private[ops] def ole10Native(d: Array[Byte]): Option[(String, Array[Byte])] = {
    def z(from: Int): Int = d.indexOf(0.toByte, from)
    try {
      if (d.length < 12) return None
      val labelEnd = z(6)
      val fnEnd = z(labelEnd + 1)
      if (labelEnd < 0 || fnEnd < 0) return None
      val label = new String(d, 6, labelEnd - 6, "ISO-8859-1")
      def u32(p: Int): Long =
        (d(p) & 0xffL) | ((d(p + 1) & 0xffL) << 8) |
          ((d(p + 2) & 0xffL) << 16) | ((d(p + 3) & 0xffL) << 24)
      val afterFn = fnEnd + 1 + 4 // two u16s
      val structured =
        if (afterFn + 4 <= d.length) {
          val tmpLen = u32(afterFn)
          val sizeAt = afterFn + 4 + tmpLen
          if (tmpLen >= 0 && tmpLen < 4096 && sizeAt + 4 <= d.length) {
            val n = u32(sizeAt.toInt)
            if (n > 0 && sizeAt + 4 + n <= d.length)
              Some(java.util.Arrays.copyOfRange(d, (sizeAt + 4).toInt,
                (sizeAt + 4 + n).toInt))
            else None
          } else None
        } else None
      val payload = structured.orElse {
        // magic-anchored fallback: u32 size right before the payload
        val magics = Seq("PK\u0003\u0004", "%PDF", "{\\rtf")
        magics.iterator.flatMap { m =>
          val mb = m.getBytes("ISO-8859-1")
          val at = d.indexOfSlice(mb)
          if (at >= 4) {
            val n = u32(at - 4)
            if (n > 0 && at + n <= d.length)
              Some(java.util.Arrays.copyOfRange(d, at, (at + n).toInt))
            else None
          } else None
        }.nextOption()
      }
      payload.map(label -> _)
    } catch { case _: Exception => None }
  }

  /** Text of one embedded object (a .bin under word/embeddings): CFB →
    * Ole10Native → payload routed by its packaged filename — zips walk
    * recursively through [[ZipParse]] (the shape of Tika's
    * test_recursive_embedded.docx, where the text sits three archive
    * levels down), other types go back through the parse gate. */
  private def embeddedText(bytes: Array[Byte]): String =
    (for {
      cfb <- graft.ops.WordDoc.Cfb(bytes)
      entry <- cfb.entries.find(_.name.endsWith("Ole10Native"))
      data <- cfb.stream(entry.name)
      (name, payload) <- ole10Native(data)
    } yield {
      if (name.toLowerCase.endsWith(".zip"))
        ZipParse.parse(s"embedded://$name", payload, maxDepth = 4).text
      else ZipParse.contentTypeOf(name)
        .map(ct => Parse.parsePage(s"embedded://$name", payload, ct,
          Parse.Config())._3)
        .getOrElse("")
    }).getOrElse("")

  /** OOXML wordprocessing text: word/document.xml, plus the text of
    * any embedded packaged objects (word/embeddings). */
  def extractDocx(bytes: Array[Byte]): Option[String] = {
    val ms = members(bytes, n => n == "word/document.xml" ||
      (n.startsWith("word/embeddings/") && n.endsWith(".bin")))
    ms.get("word/document.xml").map { b =>
      val main = xmlText(new String(b, "UTF-8"))
      val embedded = ms.toSeq.sortBy(_._1).collect {
        case (n, eb) if n.startsWith("word/embeddings/") => embeddedText(eb)
      }.filter(_.nonEmpty)
      (main +: embedded).filter(_.nonEmpty).mkString("\n")
    }
  }

  private val SheetNameRe = """<sheet[^>]*\sname="([^"]*)"""".r
  private val CellRe =
    """(?s)<c\b([^>]*)(?:/>|>(.*?)</c>)""".r
  private val VRe = """(?s)<v[^>]*>(.*?)</v>""".r
  private val IsTRe = """(?s)<t[^>]*>(.*?)</t>""".r
  private val SiRe = """(?s)<si>(.*?)</si>""".r

  /** OOXML spreadsheet text: per sheet, the sheet name then every cell
    * value in document order (Tika's shape). */
  def extractXlsx(bytes: Array[Byte]): Option[String] = {
    val ms = members(bytes, n => n == "xl/workbook.xml" ||
      n == "xl/sharedStrings.xml" || (n.startsWith("xl/worksheets/") &&
        n.endsWith(".xml")))
    val workbook = ms.get("xl/workbook.xml").map(new String(_, "UTF-8"))
      .getOrElse(return None)
    val shared: IndexedSeq[String] = ms.get("xl/sharedStrings.xml")
      .map(b => SiRe.findAllMatchIn(new String(b, "UTF-8"))
        .map(m => IsTRe.findAllMatchIn(m.group(1)).map(_.group(1))
          .mkString)
        .map(decodeEntities).toIndexedSeq)
      .getOrElse(IndexedSeq.empty)
    val names = SheetNameRe.findAllMatchIn(workbook).map(_.group(1)).toSeq
    val sheets = ms.keys.filter(_.startsWith("xl/worksheets/")).toSeq.sorted
    val parts = sheets.zipWithIndex.map { case (path, idx) =>
      val xml = new String(ms(path), "UTF-8")
      val cells = CellRe.findAllMatchIn(xml).flatMap { m =>
        val attrs = m.group(1)
        val body = Option(m.group(2)).getOrElse("")
        if (attrs.contains("t=\"s\""))
          VRe.findFirstMatchIn(body)
            .flatMap(_.group(1).trim.toIntOption) // hostile non-numeric <v> → drop cell, don't throw
            .filter(i => i >= 0 && i < shared.length).map(shared)
        else if (attrs.contains("inlineStr"))
          IsTRe.findFirstMatchIn(body).map(m2 => decodeEntities(m2.group(1)))
        else VRe.findFirstMatchIn(body).map(m2 => decodeEntities(m2.group(1)))
      }.toSeq
      (names.lift(idx).toSeq ++ cells).mkString(" ")
    }
    Some(parts.mkString("\n").trim)
  }

  /** EPUB text: every XHTML/HTML content document in the package,
    * in zip order (the spine order refinement needs the OPF walk; zip
    * order matches it in practice since packaging tools write spine
    * order), each through the real HTML tokenizer. */
  def extractEpub(bytes: Array[Byte]): Option[String] = {
    val ms = members(bytes, n => (n.endsWith(".xhtml") ||
      n.endsWith(".html") || n.endsWith(".htm")) &&
      !n.startsWith("META-INF/"))
    if (ms.isEmpty) return None
    Some(ms.toSeq.sortBy(_._1).map { case (_, b) =>
      Html.getText(Html.parse(new String(b, "UTF-8")))
    }.filter(_.nonEmpty).mkString("\n"))
  }

  /** Container-type-aware dispatch, reusing the existing classifier. */
  def extract(bytes: Array[Byte]): Option[(String, String)] =
    graft.operators.Multimodal.zipContainerType(bytes) match {
      case t @ ("application/vnd.oasis.opendocument.text" |
        "application/vnd.oasis.opendocument.spreadsheet" |
        "application/vnd.oasis.opendocument.presentation") =>
        extractOdf(bytes).map(t -> _)
      case t if t.endsWith("spreadsheetml.sheet") =>
        extractXlsx(bytes).map(t -> _)
      case t if t.endsWith("wordprocessingml.document") =>
        extractDocx(bytes).map(t -> _)
      case t @ "application/epub+zip" =>
        extractEpub(bytes).map(t -> _)
      case _ =>
        // OpenOffice 1.x (sxw/sxc) self-declares other mimetypes but
        // still carries content.xml
        extractOdf(bytes).map("application/vnd.sun.xml.writer" -> _)
    }
}
