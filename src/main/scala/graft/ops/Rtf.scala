package graft.ops

/** First-party RTF text + metadata extraction — the parse-tika RTF
  * analog (reference: TestRTFParser.java expects body text, /info
  * title and subject from its test.rtf; RtfSpec passes all three).
  *
  * The RTF model (public spec, Word RTF 1.9): `{`/`}` delimit groups,
  * `\word[-N][ ]` control words, `\'hh` charset bytes (decoded as
  * windows-1252), `\uN` unicode escapes with `\ucN` fallback-skip
  * counts, destination groups (`fonttbl`, `pict`, …) contribute no
  * text, and `{\*\dest …}` means "skip if unknown" ONLY when the
  * `\*` opens the group — StarWriter emits mid-group `\*` which
  * readers ignore (the reference's own sample does exactly this in
  * the sentence its test asserts on). Paragraph-ish controls map to
  * newlines, cell/tab to spaces. */
object Rtf {

  final case class Result(ok: Boolean, text: String, title: String,
      subject: String, author: String)

  /** Destinations whose content is data, not document text. */
  private val SkipDest = Set(
    "fonttbl", "colortbl", "stylesheet", "listtable", "listoverridetable",
    "pict", "themedata", "colorschememapping", "datastore", "fldinst",
    "generator", "header", "footer", "headerl", "headerr", "headerf",
    "footerl", "footerr", "footerf", "xmlnstbl", "filetbl", "revtbl",
    "object", "pgdsctbl", "listtext", "levelnumbers", "leveltext")

  private val NewlineCtl = Set("par", "line", "sect", "page", "row")
  private val SpaceCtl = Set("tab", "cell", "nestcell", "emspace",
    "enspace", "qmspace")

  def parse(bytes: Array[Byte]): Result = {
    if (bytes == null || bytes.length < 5 ||
      !new String(bytes, 0, 5, "ISO-8859-1").startsWith("{\\rtf"))
      return Result(ok = false, "", "", "", "")
    val s = new String(bytes, java.nio.charset.Charset.forName("windows-1252"))
    val text = new StringBuilder
    val info = scala.collection.mutable.Map.empty[String, StringBuilder]
    // group state as parallel stacks: skip-depth model keeps it O(1)
    var depth = 0
    var skipUntil = -1 // skip all content while depth > skipUntil ≥ 0
    var infoDest: String = null // "title"/"subject"/"author" inside \info
    var infoDepth = -1
    var uc = 1 // current \uc skip count (simplification: global)
    var groupJustOpened = false
    var i = 0
    def out(c: Char): Unit = {
      if (skipUntil >= 0) ()
      else if (infoDest != null) info.getOrElseUpdate(infoDest,
        new StringBuilder).append(c)
      else text.append(c)
    }
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '{' =>
          depth += 1; groupJustOpened = true; i += 1
        case '}' =>
          depth -= 1
          if (skipUntil >= 0 && depth <= skipUntil) skipUntil = -1
          if (infoDest != null && depth <= infoDepth) infoDest = null
          if (infoDepth >= 0 && depth < infoDepth) infoDepth = -1
          groupJustOpened = false; i += 1
        case '\\' if i + 1 < s.length =>
          val n = s.charAt(i + 1)
          if (n == '\'') { // \'hh charset byte
            if (i + 3 < s.length) {
              val hi = Character.digit(s.charAt(i + 2), 16)
              val lo = Character.digit(s.charAt(i + 3), 16)
              if (hi >= 0 && lo >= 0) // hostile non-hex digits: skip
                out(new String(Array(((hi << 4) | lo).toByte),
                  java.nio.charset.Charset.forName("windows-1252")).charAt(0))
            }
            i += 4
          } else if (!Character.isLetter(n) && n != '*') {
            // escaped delimiter or symbol control
            n match {
              case '\\' | '{' | '}' => out(n)
              case '~' => out(' ')
              case '-' | '_' => () // soft hyphens
              case '\r' | '\n' => out('\n')
              case _ => ()
            }
            i += 2
            groupJustOpened = false
          } else if (n == '*') {
            // ignorable-destination marker: honored only at group start
            if (groupJustOpened && skipUntil < 0) {
              // peek the destination control word; known info fields
              // still extract, everything else skips
              val m = """\\\*\\([a-z]+)""".r
                .findPrefixMatchOf(s.subSequence(i, s.length))
              val dest = m.map(_.group(1)).getOrElse("")
              if (!Set("title", "subject", "author").contains(dest))
                skipUntil = depth - 1
            }
            i += 2
            groupJustOpened = false
          } else {
            // control word
            var j = i + 1
            while (j < s.length && Character.isLetter(s.charAt(j))) j += 1
            val word = s.substring(i + 1, j)
            var param: Option[Int] = None
            if (j < s.length && (s.charAt(j) == '-' ||
              Character.isDigit(s.charAt(j)))) {
              val pj = j
              var k = j + (if (s.charAt(j) == '-') 1 else 0)
              while (k < s.length && Character.isDigit(s.charAt(k))) k += 1
              param = try Some(s.substring(pj, k).toInt)
              catch { case _: NumberFormatException => None }
              j = k
            }
            if (j < s.length && s.charAt(j) == ' ') j += 1 // delimiter
            word match {
              case "uc" => uc = param.getOrElse(1)
              case "u" =>
                val v = param.getOrElse(0)
                out((if (v < 0) v + 65536 else v).toChar)
                // skip the fallback chars (uc of them)
                var skip = uc
                while (skip > 0 && j < s.length) {
                  if (s.charAt(j) == '\\' && j + 3 < s.length &&
                    s.charAt(j + 1) == '\'') j += 4
                  else j += 1
                  skip -= 1
                }
              case "info" =>
                infoDepth = depth
              case "title" | "subject" | "author"
                if infoDepth >= 0 && skipUntil < 0 =>
                infoDest = word
              case d if SkipDest.contains(d) && groupJustOpened &&
                skipUntil < 0 =>
                skipUntil = depth - 1
              case d if NewlineCtl.contains(d) => out('\n')
              case d if SpaceCtl.contains(d) => out(' ')
              case _ => ()
            }
            i = j
            groupJustOpened = false
          }
        case '\r' | '\n' => i += 1 // raw newlines are ignorable
        case _ =>
          out(c)
          groupJustOpened = false
          i += 1
      }
    }
    def field(k: String): String =
      info.get(k).map(_.toString.trim).getOrElse("")
    Result(ok = true, text.toString.trim, field("title"), field("subject"),
      field("author"))
  }
}
