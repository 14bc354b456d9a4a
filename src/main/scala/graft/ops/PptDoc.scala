package graft.ops

/** PowerPoint-97 (.ppt) text extraction — completing the legacy
  * Office binary triple (doc/xls/ppt) over the first-party
  * [[WordDoc.Cfb]] reader. The `PowerPoint Document` stream is a tree
  * of records (MS-PPT RecordHeader: u16 recVer/recInstance, u16
  * recType, u32 recLen; a recVer of 0xF marks a container whose
  * payload is nested records). Slide text lives in `TextCharsAtom`
  * (0x0FA0, UTF-16LE) and `TextBytesAtom` (0x0FA8, 8-bit cp1252) —
  * the same two atoms lightweight extractors (incl. Tika's HSLF
  * fallback path) read; `CString` (0x0FBA) carries titles/notes
  * metadata strings. The walk is bounded and order-preserving; text
  * atoms concatenate with newlines. Encrypted decks carry a
  * `CryptSession10Container` (0x2F14) → None honestly. */
object PptDoc {

  def extract(bytes: Array[Byte]): Option[String] =
    try {
      val cfb = WordDoc.Cfb(bytes).getOrElse(return None)
      val doc = cfb.stream("PowerPoint Document").getOrElse(return None)
      // raw indexing: out-of-bounds on hostile input lands in the
      // AIOOBE catch below and reads as None
      def u16(p: Int): Int = (doc(p) & 0xff) | ((doc(p + 1) & 0xff) << 8)
      def u32(p: Int): Long =
        u16(p).toLong | (u16(p + 2).toLong << 16)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var budget = 1 << 20 // record-count bound on hostile nesting
      def walk(from: Int, to: Int): Boolean = { // false = encrypted
        var p = from
        while (p + 8 <= to && budget > 0) {
          budget -= 1
          val verInst = u16(p)
          val typ = u16(p + 2)
          val len = u32(p + 4)
          val body = p + 8
          if (len < 0 || body + len > to) return true // truncated: stop
          val end = (body + len).toInt
          if (typ == 0x2F14) return false // encrypted deck
          if ((verInst & 0x0F) == 0x0F) {
            if (!walk(body, end)) return false // container: recurse
          } else typ match {
            case 0x0FA0 => // TextCharsAtom: UTF-16LE
              out += new String(doc, body, (len - (len % 2)).toInt,
                "UTF-16LE")
            case 0x0FA8 => // TextBytesAtom: single-byte
              out += new String(doc, body, len.toInt,
                java.nio.charset.Charset.forName("windows-1252"))
            case _ => ()
          }
          p = end
        }
        true
      }
      if (!walk(0, doc.length)) return None
      val text = out.map(_.replace('\r', '\n').trim).filter(_.nonEmpty)
        .mkString("\n")
      if (text.isEmpty) None else Some(text)
    } catch {
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }

  // ==== synth (round-trip side) ====

  private def rec(verInst: Int, typ: Int, body: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](8 + body.length)
    out(0) = (verInst & 0xff).toByte; out(1) = ((verInst >> 8) & 0xff).toByte
    out(2) = (typ & 0xff).toByte; out(3) = ((typ >> 8) & 0xff).toByte
    var v = body.length
    var i = 0
    while (i < 4) { out(4 + i) = (v & 0xff).toByte; v >>= 8; i += 1 }
    System.arraycopy(body, 0, out, 8, body.length)
    out
  }

  /** A minimal deck: a Document container holding one slide-ish
    * container with a UTF-16 text atom and a bytes atom. */
  def synth(lines: Seq[String]): Array[Byte] = {
    val atoms = lines.zipWithIndex.flatMap { case (s, i) =>
      if (i % 2 == 0) rec(0, 0x0FA0, s.getBytes("UTF-16LE"))
      else rec(0, 0x0FA8,
        s.getBytes(java.nio.charset.Charset.forName("windows-1252")))
    }.toArray
    val slide = rec(0x000F, 0x03EE, atoms) // SlideContainer
    val document = rec(0x000F, 0x03E8, slide) // DocumentContainer
    WordDoc.Cfb.build(Seq("PowerPoint Document" -> document))
  }
}
