package graft.ops

/** First-party Word-97 (.doc) text extraction — the last parse-tika
  * sample format (reference: TestMSWordParser.java expects its
  * word97.doc to START with "This is a sample doc file prepared for
  * nutch."; WordDocSpec passes it).
  *
  * Two public layers:
  *   - [[Cfb]]: an OLE2/Compound-File-Binary reader (MS-CFB spec) —
  *     header, DIFAT (incl. chained DIFAT sectors), FAT chains,
  *     directory tree, mini-FAT and the root mini-stream (streams
  *     under the 4096-byte cutoff live there, as this sample's do)
  *   - the Word layer (MS-DOC spec): FIB → which Table stream →
  *     CLX at fcClx → the PlcPcd piece table → text pieces, each
  *     either "compressed" cp1252 (fc bit 30, halved offset) or
  *     UTF-16LE, in content order
  *
  * Field/control characters map Tika-like: CR and cell/row marks
  * become newlines, tabs stay, field-begin/separator/end (0x13-0x15)
  * and the other C0 controls drop. Encrypted documents (FIB
  * fEncrypted) and non-Word OLE2 files return None.
  */
object WordDoc {

  private final class Malformed
    extends RuntimeException(null, null, false, false)
  private def bad(): Nothing = throw new Malformed

  private val Free = 0xFFFFFFFF
  private val EndOfChain = 0xFFFFFFFE

  /** Minimal CFB reader: named streams of an OLE2 compound file. */
  object Cfb {
    final case class Entry(name: String, objType: Int, start: Int,
        size: Long)

    final class File(data: Array[Byte]) {
      if (data.length < 512) bad()
      private def u16(p: Int): Int =
        if (p + 2 > data.length) bad()
        else (data(p) & 0xff) | ((data(p + 1) & 0xff) << 8)
      private def u32(p: Int): Long =
        u16(p).toLong | (u16(p + 2).toLong << 16)
      if (u32(0) != 0xE011CFD0L || u32(4) != 0xE11AB1A1L) bad()
      private val sectorSize = 1 << u16(30)
      private val miniSize = 1 << u16(32)
      if (sectorSize < 128 || sectorSize > 4096) bad()
      private val miniCutoff = u32(56)
      private def sector(i: Int): (Int, Int) = {
        if (i < 0) bad()
        val at = sectorSize * (i + 1)
        if (at < 0 || at + sectorSize > data.length) bad()
        (at, sectorSize)
      }
      // FAT via DIFAT: 109 header entries + chained DIFAT sectors
      private val fat: Array[Int] = {
        val ids = scala.collection.mutable.ArrayBuffer.empty[Int]
        var i = 0
        while (i < 109) {
          val v = u32(76 + i * 4)
          if (v != (Free & 0xFFFFFFFFL) && v != (EndOfChain & 0xFFFFFFFFL))
            ids += v.toInt
          i += 1
        }
        var difat = u32(68).toInt
        var guard = 0
        while (difat != EndOfChain.toInt && difat != Free.toInt &&
          guard < 4096) {
          val (at, sz) = sector(difat)
          var k = 0
          while (k < sz / 4 - 1) {
            val v = u32(at + k * 4)
            if (v != (Free & 0xFFFFFFFFL) && v != (EndOfChain & 0xFFFFFFFFL))
              ids += v.toInt
            k += 1
          }
          difat = u32(at + sz - 4).toInt
          guard += 1
        }
        val out = new Array[Int](ids.length * (sectorSize / 4))
        var w = 0
        ids.foreach { s =>
          val (at, sz) = sector(s)
          var k = 0
          while (k < sz / 4) { out(w) = u32(at + k * 4).toInt; w += 1; k += 1 }
        }
        out
      }
      private def chain(start: Int, table: Array[Int]): Seq[Int] = {
        val out = scala.collection.mutable.ArrayBuffer.empty[Int]
        var s = start
        while (s != EndOfChain.toInt && s != Free.toInt && s >= 0 &&
          s < table.length) {
          out += s
          if (out.length > (1 << 20)) bad() // cyclic chain
          s = table(s)
        }
        out.toSeq
      }
      private def readChain(start: Int): Array[Byte] = {
        val secs = chain(start, fat)
        val out = new Array[Byte](secs.length * sectorSize)
        var w = 0
        secs.foreach { s =>
          val (at, sz) = sector(s)
          System.arraycopy(data, at, out, w, sz)
          w += sz
        }
        out
      }
      val entries: Seq[Entry] = {
        val dir = readChain(u32(48).toInt)
        (0 until dir.length / 128).flatMap { i =>
          val base = i * 128
          val nlen = (dir(base + 64) & 0xff) | ((dir(base + 65) & 0xff) << 8)
          if (nlen < 2 || nlen > 64) None
          else Some(Entry(
            new String(dir, base, nlen - 2, "UTF-16LE"),
            dir(base + 66) & 0xff,
            ((dir(base + 116) & 0xff) | ((dir(base + 117) & 0xff) << 8) |
              ((dir(base + 118) & 0xff) << 16) |
              ((dir(base + 119) & 0xff) << 24)),
            ((dir(base + 120) & 0xffL) | ((dir(base + 121) & 0xffL) << 8) |
              ((dir(base + 122) & 0xffL) << 16) |
              ((dir(base + 123) & 0xffL) << 24))))
        }
      }
      private val root = entries.find(_.objType == 5).getOrElse(bad())
      private lazy val miniStream: Array[Byte] = readChain(root.start)
      private lazy val miniFat: Array[Int] = {
        val raw = readChain(u32(60).toInt)
        Array.tabulate(raw.length / 4)(i =>
          ((raw(i * 4) & 0xff) | ((raw(i * 4 + 1) & 0xff) << 8) |
            ((raw(i * 4 + 2) & 0xff) << 16) |
            ((raw(i * 4 + 3) & 0xff) << 24)))
      }
      def stream(name: String): Option[Array[Byte]] = try {
        entries.find(e => e.name == name && e.objType == 2).map { e =>
          val full =
            if (e.size < miniCutoff) {
              val secs = chain(e.start, miniFat)
              val out = new Array[Byte](secs.length * miniSize)
              var w = 0
              secs.foreach { s =>
                if ((s + 1) * miniSize <= miniStream.length) {
                  System.arraycopy(miniStream, s * miniSize, out, w, miniSize)
                }
                w += miniSize
              }
              out
            } else readChain(e.start)
          if (e.size > full.length) bad()
          java.util.Arrays.copyOf(full, e.size.toInt)
        }
      } catch { // truncated/hostile chains: absent, not thrown
        case _: Malformed => None
        case _: ArrayIndexOutOfBoundsException => None
      }
    }

    def apply(bytes: Array[Byte]): Option[File] =
      try { if (bytes == null) None else Some(new File(bytes)) }
      catch {
        case _: Malformed => None
        case _: ArrayIndexOutOfBoundsException => None
      }

    /** Assemble a minimal valid CFB container: header + one FAT sector
      * + one directory sector + the streams, each padded past the 4096
      * mini-stream cutoff (spec-legal — keeps the writer honest
      * without a mini-FAT). Up to 3 streams (a directory sector holds
      * root + 3). Directory siblings chain linearly; readers that
      * honor the red-black ordering still resolve names since entries
      * scan in one sector. */
    def build(streams: Seq[(String, Array[Byte])]): Array[Byte] = {
      require(streams.nonEmpty && streams.size <= 3)
      val SS = 512
      def p16(a: Array[Byte], p: Int, v: Int): Unit = {
        a(p) = (v & 0xff).toByte; a(p + 1) = ((v >> 8) & 0xff).toByte
      }
      def p32(a: Array[Byte], p: Int, v: Long): Unit = {
        p16(a, p, (v & 0xffff).toInt)
        p16(a, p + 2, ((v >> 16) & 0xffff).toInt)
      }
      val padded = streams.map { case (n, d) =>
        val size = math.max(4096, ((d.length + SS - 1) / SS) * SS)
        val out = new Array[Byte](size)
        System.arraycopy(d, 0, out, 0, d.length)
        (n, d.length, out)
      }
      val secCounts = padded.map(_._3.length / SS)
      val total = 2 + secCounts.sum
      require(total <= SS / 4, "single-FAT-sector builder")
      val out = new Array[Byte](SS * (1 + total))
      p32(out, 0, 0xE011CFD0L); p32(out, 4, 0xE11AB1A1L)
      p16(out, 24, 0x003E); p16(out, 26, 0x0003); p16(out, 28, 0xFFFE)
      p16(out, 30, 9); p16(out, 32, 6)
      p32(out, 44, 1) // one FAT sector
      p32(out, 48, 1) // directory at sector 1
      p32(out, 56, 4096)
      p32(out, 60, EndOfChain.toLong); p32(out, 64, 0) // no mini-FAT
      p32(out, 68, EndOfChain.toLong); p32(out, 72, 0) // no DIFAT chain
      p32(out, 76, 0)
      var i = 1
      while (i < 109) { p32(out, 76 + i * 4, Free.toLong); i += 1 }
      val fatAt = SS
      p32(out, fatAt, 0xFFFFFFFDL) // FAT marker
      p32(out, fatAt + 4, EndOfChain.toLong) // directory
      var s = 2
      padded.foreach { case (_, _, data) =>
        val n = data.length / SS
        var k = 0
        while (k < n) {
          p32(out, fatAt + (s + k) * 4,
            if (k == n - 1) EndOfChain.toLong else (s + k + 1).toLong)
          k += 1
        }
        s += n
      }
      i = total
      while (i < SS / 4) { p32(out, fatAt + i * 4, Free.toLong); i += 1 }
      val dirAt = 2 * SS
      def entry(idx: Int, name: String, typ: Int, start: Long,
          size: Long, child: Long, right: Long): Unit = {
        val base = dirAt + idx * 128
        val u = name.getBytes("UTF-16LE")
        System.arraycopy(u, 0, out, base, u.length)
        p16(out, base + 64, u.length + 2)
        out(base + 66) = typ.toByte
        out(base + 67) = 1
        p32(out, base + 68, Free.toLong)
        p32(out, base + 72, right)
        p32(out, base + 76, child)
        p32(out, base + 116, start)
        p32(out, base + 120, size)
      }
      entry(0, "Root Entry", 5, EndOfChain.toLong, 0, 1, Free.toLong)
      var start = 2L
      padded.zipWithIndex.foreach { case ((name, _, data), k) =>
        // declared size = padded size: a sub-4096 declared size would
        // send readers to the (absent) mini-stream; consumers tolerate
        // the zero tail (a zero BIFF/record type is skipped)
        entry(1 + k, name, 2, start, data.length.toLong,
          Free.toLong,
          if (k + 1 < padded.size) (2 + k).toLong else Free.toLong)
        start += data.length / SS
      }
      var at = 3 * SS
      padded.foreach { case (_, _, data) =>
        System.arraycopy(data, 0, out, at, data.length)
        at += data.length
      }
      out
    }
  }

  final case class Result(text: String)

  def extract(bytes: Array[Byte]): Option[Result] =
    try {
      if (bytes == null) return None
      val cfb = Cfb(bytes).getOrElse(return None)
      val wd = cfb.stream("WordDocument").getOrElse(return None)
      if (wd.length < 0x01AA) return None
      def u16(a: Array[Byte], p: Int): Int =
        (a(p) & 0xff) | ((a(p + 1) & 0xff) << 8)
      def u32(a: Array[Byte], p: Int): Long =
        u16(a, p).toLong | (u16(a, p + 2).toLong << 16)
      if (u16(wd, 0) != 0xA5EC) return None // wIdent: not a Word file
      val flags = u16(wd, 0x000A)
      if ((flags & 0x0100) != 0) return None // fEncrypted
      val whichTbl = (flags >> 9) & 1
      val tbl = cfb.stream(s"${whichTbl}Table").getOrElse(return None)
      val fcClx = u32(wd, 0x01A2).toInt
      val lcbClx = u32(wd, 0x01A6).toInt
      if (fcClx < 0 || lcbClx <= 0 || fcClx + lcbClx > tbl.length)
        return None
      val out = new StringBuilder
      var i = fcClx
      val end = fcClx + lcbClx
      var done = false
      while (!done && i < end) {
        (tbl(i) & 0xff) match {
          case 1 => // Prc (property modifier data): skip
            if (i + 3 > end) bad()
            i += 3 + u16(tbl, i + 1)
          case 2 => // PlcPcd: the piece table
            if (i + 5 > end) bad()
            val sz = u32(tbl, i + 1).toInt
            val plc = i + 5
            if (plc + sz > end || sz < 4) bad()
            val n = (sz - 4) / 12
            var k = 0
            while (k < n) {
              val cpStart = u32(tbl, plc + 4 * k)
              val cpEnd = u32(tbl, plc + 4 * (k + 1))
              val pcdAt = plc + 4 * (n + 1) + 8 * k
              val fcRaw = u32(tbl, pcdAt + 2)
              val compressed = ((fcRaw >> 30) & 1) == 1
              val fc = (fcRaw & 0x3FFFFFFFL).toInt
              val len = (cpEnd - cpStart).toInt
              if (len < 0 || len > (1 << 26)) bad()
              if (compressed) {
                val at = fc / 2
                if (at + len > wd.length) bad()
                out.append(new String(wd, at, len,
                  java.nio.charset.Charset.forName("windows-1252")))
              } else {
                if (fc + 2 * len > wd.length) bad()
                out.append(new String(wd, fc, 2 * len, "UTF-16LE"))
              }
              k += 1
            }
            done = true
          case _ => done = true
        }
      }
      if (out.isEmpty) return None
      // control-character cleanup (Tika-like): CR and cell (0x07) /
      // VT / FF marks become newlines; tab and newline stay; field
      // marks (0x13-0x15) and every other C0 control drop
      val cleaned = out.toString.flatMap { c =>
        if (c == '\r' || c == 0x07 || c == 0x0b || c == 0x0c) "\n"
        else if (c == '\t' || c == '\n' || c >= ' ') c.toString
        else ""
      }
      Some(Result(cleaned.replaceAll("\n{3,}", "\n\n").trim))
    } catch {
      case _: Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
    }

  // ==== synth: a minimal-but-valid CFB + Word file (oracle side) ====

  /** Build a real Word-97 file: a valid CFB container (one FAT sector,
    * no mini-stream — streams padded past the 4096 cutoff, which is
    * spec-legal and keeps the writer honest without a mini-FAT
    * writer), a FIB pointing at a CLX in 1Table, and a TWO-piece
    * piece table: the first piece cp1252-"compressed", the second
    * UTF-16LE — so the oracle path proves both text encodings and
    * the piece-ordering logic. */
  def synth(part1: String, part2: String): Array[Byte] = {
    val SS = 512
    val enc1 = part1.getBytes(java.nio.charset.Charset.forName("windows-1252"))
    val enc2 = part2.getBytes("UTF-16LE")
    // WordDocument stream: FIB header + text at fixed offsets
    val textAt1 = 0x0400
    val textAt2 = textAt1 + enc1.length
    val wd = new Array[Byte](math.max(4096, textAt2 + enc2.length))
    def p16(a: Array[Byte], p: Int, v: Int): Unit = {
      a(p) = (v & 0xff).toByte; a(p + 1) = ((v >> 8) & 0xff).toByte
    }
    def p32(a: Array[Byte], p: Int, v: Long): Unit = {
      p16(a, p, (v & 0xffff).toInt); p16(a, p + 2, ((v >> 16) & 0xffff).toInt)
    }
    p16(wd, 0, 0xA5EC) // wIdent
    p16(wd, 2, 0x00C1) // nFib (Word 97)
    p16(wd, 0x000A, 1 << 9) // fWhichTblStm = 1
    System.arraycopy(enc1, 0, wd, textAt1, enc1.length)
    System.arraycopy(enc2, 0, wd, textAt2, enc2.length)
    // 1Table: CLX with a 2-piece PlcPcd
    val n = 2
    val cp0 = 0L
    val cp1 = part1.length.toLong
    val cp2 = cp1 + part2.length
    val plcSize = 4 * (n + 1) + 8 * n
    val clx = new Array[Byte](5 + plcSize)
    clx(0) = 2
    p32(clx, 1, plcSize)
    p32(clx, 5, cp0); p32(clx, 9, cp1); p32(clx, 13, cp2)
    // piece 1: compressed → fc = byteOffset*2 with bit30 set
    p32(clx, 17 + 2, (textAt1.toLong * 2) | (1L << 30))
    // piece 2: utf-16 → plain byte offset
    p32(clx, 25 + 2, textAt2.toLong)
    val fcClx = 64
    val tbl = new Array[Byte](4096)
    System.arraycopy(clx, 0, tbl, fcClx, clx.length)
    p32(wd, 0x01A2, fcClx)
    p32(wd, 0x01A6, clx.length)
    // CFB assembly: [header][FAT s0][dir s1][wd sectors][tbl sectors]
    val wdSecs = (wd.length + SS - 1) / SS
    val tblSecs = (tbl.length + SS - 1) / SS
    val total = 2 + wdSecs + tblSecs
    val out = new Array[Byte](SS * (1 + total))
    p32(out, 0, 0xE011CFD0L); p32(out, 4, 0xE11AB1A1L)
    p16(out, 24, 0x003E) // minor version
    p16(out, 26, 0x0003) // major version 3 (512-byte sectors)
    p16(out, 28, 0xFFFE) // little-endian marker
    p16(out, 30, 9) // sector shift
    p16(out, 32, 6) // mini shift
    p32(out, 44, 1) // one FAT sector
    p32(out, 48, 1) // directory start = sector 1
    p32(out, 56, 4096) // mini cutoff
    p32(out, 60, EndOfChain.toLong) // first mini-FAT sector: none
    p32(out, 64, 0) // mini-FAT sector count
    p32(out, 68, EndOfChain.toLong) // first DIFAT sector: none
    p32(out, 72, 0) // DIFAT sector count
    p32(out, 76, 0) // DIFAT[0] = FAT at sector 0
    var i = 1
    while (i < 109) { p32(out, 76 + i * 4, Free.toLong); i += 1 }
    // FAT (sector 0)
    val fatAt = SS
    def fatSet(sec: Int, v: Long): Unit = p32(out, fatAt + sec * 4, v)
    fatSet(0, 0xFFFFFFFDL) // FAT sector marker
    fatSet(1, EndOfChain.toLong) // directory
    var s = 2
    while (s < 2 + wdSecs) {
      fatSet(s, if (s == 1 + wdSecs) EndOfChain.toLong else s + 1L)
      s += 1
    }
    while (s < total) {
      fatSet(s, if (s == total - 1) EndOfChain.toLong else s + 1L)
      s += 1
    }
    i = total
    while (i < SS / 4) { p32(out, fatAt + i * 4, Free.toLong); i += 1 }
    // directory (sector 1): root + WordDocument + 1Table
    val dirAt = 2 * SS
    def dirEntry(idx: Int, name: String, typ: Int, start: Long,
        size: Long): Unit = {
      val base = dirAt + idx * 128
      val u = name.getBytes("UTF-16LE")
      System.arraycopy(u, 0, out, base, u.length)
      p16(out, base + 64, u.length + 2)
      out(base + 66) = typ.toByte
      out(base + 67) = 1 // black
      p32(out, base + 68, Free.toLong) // left sibling
      p32(out, base + 72, Free.toLong) // right sibling
      p32(out, base + 76, Free.toLong) // child
      p32(out, base + 116, start)
      p32(out, base + 120, size)
    }
    dirEntry(0, "Root Entry", 5, EndOfChain.toLong, 0)
    // root's child tree: point root's child at entry 1, siblings chain
    p32(out, dirAt + 76, 1)
    dirEntry(1, "WordDocument", 2, 2, wd.length.toLong)
    p32(out, dirAt + 128 + 72, 2) // right sibling -> 1Table
    dirEntry(2, "1Table", 2, 2L + wdSecs, tbl.length.toLong)
    // remaining dir entries stay type 0 (unused)
    System.arraycopy(wd, 0, out, SS * 3, wd.length)
    System.arraycopy(tbl, 0, out, SS * (3 + wdSecs), tbl.length)
    out
  }
}
