package graft.operators

import java.util.zip.Inflater

/** First-party baseline-TIFF decoder (TIFF 6.0): both byte orders,
  * strip organization, 8-bit grayscale (both photometric polarities) /
  * RGB / RGBA-with-dropped-alpha, compressions None, PackBits, LZW
  * (TIFF flavor: MSB-first code packing and the notorious "early
  * change" width bump, one code earlier than GIF's schedule) and
  * Deflate/ZLib, plus the horizontal-differencing predictor, in both
  * STRIP and TILE organizations (tiles decompress at full padded tile
  * size; the in-bounds region lands in the raster). Planar and
  * sub-8-bit layouts return None (the chunky 8-bit family is what
  * web-crawled TIFFs overwhelmingly are).
  *
  * Conformance is against the JDK's INDEPENDENT ImageIO TIFF plugin
  * (javax.imageio, Java 9+): TiffCodecSpec writes images through
  * ImageIO at every supported compression and asserts raster-exact
  * decode, and feeds [[synth]] output back through ImageIO — so the
  * LZW early-change and predictor conventions are pinned empirically
  * in both directions, not transcribed. TIFF is lossless, hence
  * oracle-exact (query `tiff_stats`).
  *
  * The reference (apache/nutch) gets TIFF via Tika's ImageParser
  * (src/plugin/parse-tika); here the decode is first-party so the
  * multimodal feature path needs no codec library at 100 TB scale.
  */
object TiffCodec {

  private final class Malformed
    extends RuntimeException(null, null, false, false)
  private def bad(): Nothing = throw new Malformed

  /** IFD scalar/array reader over either byte order. */
  private final class Reader(data: Array[Byte], le: Boolean) {
    def u8(p: Int): Int = {
      if (p < 0 || p >= data.length) bad()
      data(p) & 0xff
    }
    def u16(p: Int): Int =
      if (le) u8(p) | (u8(p + 1) << 8) else (u8(p) << 8) | u8(p + 1)
    def u32(p: Int): Long =
      if (le) u16(p).toLong | (u16(p + 2).toLong << 16)
      else (u16(p).toLong << 16) | u16(p + 2).toLong
  }

  private final case class Entry(tag: Int, typ: Int, count: Long, at: Int)

  /** Field values as longs — handles BYTE/SHORT/LONG, inline or
    * offset-addressed per the 4-byte rule. */
  private def values(r: Reader, e: Entry): Array[Long] = {
    val size = e.typ match {
      case 1 => 1 // BYTE
      case 3 => 2 // SHORT
      case 4 => 4 // LONG
      case _ => return Array.empty // RATIONAL etc: not needed
    }
    if (e.count > (1 << 20)) bad()
    val n = e.count.toInt
    val base =
      if (size * e.count <= 4) e.at + 8 else r.u32(e.at + 8).toInt
    Array.tabulate(n) { i =>
      size match {
        case 1 => r.u8(base + i).toLong
        case 2 => r.u16(base + i * 2).toLong
        case _ => r.u32(base + i * 4)
      }
    }
  }

  private def parseIfd(bytes: Array[Byte]): Option[(Reader, Map[Int, Entry])] = {
    if (bytes == null || bytes.length < 8) return None
    val le = bytes(0) == 'I' && bytes(1) == 'I'
    val be = bytes(0) == 'M' && bytes(1) == 'M'
    if (!le && !be) return None
    val r = new Reader(bytes, le)
    if (r.u16(2) != 42) return None
    val ifd = r.u32(4).toInt
    if (ifd < 8 || ifd + 2 > bytes.length) return None
    val n = r.u16(ifd)
    if (ifd + 2 + n * 12 > bytes.length) return None
    val entries = (0 until n).map { i =>
      val at = ifd + 2 + i * 12
      val e = Entry(r.u16(at), r.u16(at + 2), r.u32(at + 4), at)
      e.tag -> e
    }.toMap
    Some((r, entries))
  }

  /** Header-only dimension parse (the [[Multimodal.imageDims]] path). */
  def dims(bytes: Array[Byte]): Option[(Int, Int)] =
    try parseIfd(bytes).flatMap { case (r, tags) =>
      for {
        w <- tags.get(256).flatMap(e => values(r, e).headOption)
        h <- tags.get(257).flatMap(e => values(r, e).headOption)
        if w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue
      } yield (w.toInt, h.toInt)
    } catch { case _: Malformed => None }

  // ---- decompressors ----

  /** PackBits (TIFF 6.0 §9): literal runs and repeat runs. */
  private def unpackBits(src: Array[Byte], expect: Int): Array[Byte] = {
    val out = new Array[Byte](expect)
    var i = 0
    var o = 0
    while (o < expect) {
      if (i >= src.length) bad()
      val n = src(i)
      i += 1
      if (n >= 0) { // n+1 literals
        if (i + n + 1 > src.length || o + n + 1 > expect) bad()
        System.arraycopy(src, i, out, o, n + 1)
        i += n + 1; o += n + 1
      } else if (n != -128) { // repeat next byte 1-n times
        if (i >= src.length || o + 1 - n > expect) bad()
        java.util.Arrays.fill(out, o, o + 1 - n, src(i))
        i += 1; o += 1 - n
      } // -128: noop
    }
    out
  }

  /** TIFF-flavor LZW (TIFF 6.0 §13): codes packed MSB-first, 256-entry
    * byte alphabet + Clear (256) + EOI (257), table grows from 258,
    * width 9→12 with the EARLY change — the width bumps when the next
    * free slot is (1<<width)−1, one code before the table actually
    * needs the extra bit (the historic off-by-one GIF doesn't have). */
  private def tiffLzw(src: Array[Byte], expect: Int): Array[Byte] = {
    val Clear = 256
    val Eoi = 257
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val out = new Array[Byte](expect)
    val tail = new Array[Byte](4096)
    var outN = 0
    var next = 258
    var width = 9
    var prev = -1
    var acc = 0L
    var accBits = 0
    var di = 0
    def firstCharOf(code: Int): Int = {
      var c = code
      while (c >= 258) c = prefix(c)
      c
    }
    def emit(code: Int): Unit = {
      var c = code
      var n = 0
      while (c >= 258) { tail(n) = suffix(c); n += 1; c = prefix(c) }
      if (outN + n + 1 > expect) bad()
      out(outN) = c.toByte; outN += 1
      var i = n - 1
      while (i >= 0) { out(outN) = tail(i); outN += 1; i -= 1 }
    }
    while (outN < expect) {
      while (accBits < width) {
        if (di >= src.length) bad()
        acc = (acc << 8) | (src(di) & 0xffL) // MSB-first
        accBits += 8; di += 1
      }
      val code = ((acc >>> (accBits - width)) & ((1 << width) - 1)).toInt
      accBits -= width
      if (code == Clear) { next = 258; width = 9; prev = -1 }
      else if (code == Eoi) {
        if (outN != expect) bad()
        return out
      } else if (prev == -1) {
        if (code >= 256) bad()
        out(outN) = code.toByte; outN += 1
        prev = code
      } else {
        if (code > next || (code == next && next >= 4096)) bad()
        val first = firstCharOf(if (code == next) prev else code)
        if (next < 4096) {
          prefix(next) = prev; suffix(next) = first.toByte
          next += 1
          // early change: one code before the GIF schedule
          if (next == (1 << width) - 1 && width < 12) width += 1
        }
        emit(code)
        prev = code
      }
    }
    out
  }

  private def inflate(src: Array[Byte], expect: Int): Array[Byte] = {
    val out = new Array[Byte](expect)
    val inf = new Inflater()
    try {
      inf.setInput(src)
      var off = 0
      while (off < expect && !inf.finished()) {
        val n = inf.inflate(out, off, expect - off)
        if (n == 0 && inf.needsInput()) bad()
        off += n
      }
      if (off < expect) bad()
      out
    } catch { case _: java.util.zip.DataFormatException => bad() }
    finally inf.end()
  }

  /** Decode to (w, h, packed RGB). Unsupported layouts → None. */
  def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    try {
      val (r, tags) = parseIfd(bytes).getOrElse(return None)
      def tagVals(t: Int): Array[Long] =
        tags.get(t).map(values(r, _)).getOrElse(Array.empty)
      def tag1(t: Int, dflt: Long): Long = tagVals(t).headOption.getOrElse(dflt)
      val w = tag1(256, 0).toInt
      val h = tag1(257, 0).toInt
      if (w <= 0 || h <= 0 || w.toLong * h > 64L * 1024 * 1024) return None
      val spp = tag1(277, 1).toInt
      if (spp != 1 && spp != 3 && spp != 4) return None
      val bits = tagVals(258)
      if (bits.nonEmpty && !bits.forall(_ == 8)) return None
      // TIFF 6.0 default for a missing BitsPerSample is 1 bit/sample;
      // this decoder's documented scope is 8-bit only, so an absent
      // tag is unsupported (never silently misdecode bilevel as gray)
      if (bits.isEmpty) return None
      if (tags.contains(258) && bits.length != spp && bits.length != 1)
        return None
      if (tag1(284, 1) != 1) return None // planar
      val photometric = tag1(262, 1).toInt
      if (photometric != 0 && photometric != 1 && photometric != 2)
        return None
      if (photometric == 2 && spp < 3) return None
      val compression = tag1(259, 1).toInt
      val predictor = tag1(317, 1).toInt
      if (predictor != 1 && predictor != 2) return None
      // segments: strips (273/279, RowsPerStrip-tall full-width bands)
      // or tiles (322-325, fixed-size padded rectangles) — one loop
      // handles both; each segment decompresses to its own geometry,
      // predictor runs per segment row, then the in-bounds region
      // lands in the raster
      val tiled = tags.contains(322) || tags.contains(323)
      val rowBytes = w * spp
      val raster = new Array[Byte](h * rowBytes)
      val segments: Seq[(Long, Long, Int, Int, Int, Int)] =
        if (tiled) {
          val tw = tag1(322, 0).toInt
          val th = tag1(323, 0).toInt
          if (tw <= 0 || th <= 0) return None
          val across = (w + tw - 1) / tw
          val down = (h + th - 1) / th
          val offsets = tagVals(324)
          val counts = tagVals(325)
          if (offsets.length != across * down ||
            counts.length != offsets.length) return None
          for (ty <- 0 until down; tx <- 0 until across) yield {
            val i = ty * across + tx
            (offsets(i), counts(i), tx * tw, ty * th, tw, th)
          }
        } else {
          val offsets = tagVals(273)
          val counts = tagVals(279)
          if (offsets.isEmpty || offsets.length != counts.length) return None
          val rps = math.min(tag1(278, h.toLong), h.toLong).toInt
          if (rps <= 0) return None
          if (offsets.length != (h + rps - 1) / rps) return None
          offsets.indices.map { i =>
            (offsets(i), counts(i), 0, i * rps, w,
              math.min(rps, h - i * rps))
          }
        }
      for ((off, cnt, x0, y0, segW, segH) <- segments) {
        // tiles decompress at FULL tile size even at the image edge
        val segRowBytes = segW * spp
        val expect = segH * segRowBytes
        if (off < 0 || cnt < 0 || off + cnt > bytes.length) bad()
        val src = java.util.Arrays.copyOfRange(bytes, off.toInt,
          (off + cnt).toInt)
        val data = compression match {
          case 1 =>
            if (src.length < expect) bad()
            src
          case 5              => tiffLzw(src, expect)
          case 8 | 32946      => inflate(src, expect)
          case 32773          => unpackBits(src, expect)
          case _              => return None
        }
        if (predictor == 2) { // horizontal differencing, per channel
          var row = 0
          while (row < segH) {
            var x = spp
            while (x < segRowBytes) {
              data(row * segRowBytes + x) =
                (data(row * segRowBytes + x) +
                  data(row * segRowBytes + x - spp)).toByte
              x += 1
            }
            row += 1
          }
        }
        val copyRows = math.min(segH, h - y0)
        val copyBytes = math.min(segW, w - x0) * spp
        var row = 0
        while (row < copyRows) {
          System.arraycopy(data, row * segRowBytes, raster,
            (y0 + row) * rowBytes + x0 * spp, copyBytes)
          row += 1
        }
      }
      // raster -> packed RGB
      val rgb = new Array[Byte](w * h * 3)
      var p = 0
      while (p < w * h) {
        if (spp == 1) {
          val g0 = raster(p) & 0xff
          val g = if (photometric == 0) 255 - g0 else g0
          rgb(p * 3) = g.toByte; rgb(p * 3 + 1) = g.toByte
          rgb(p * 3 + 2) = g.toByte
        } else {
          rgb(p * 3) = raster(p * spp)
          rgb(p * 3 + 1) = raster(p * spp + 1)
          rgb(p * 3 + 2) = raster(p * spp + 2) // spp=4: alpha dropped
        }
        p += 1
      }
      Some((w, h, rgb))
    } catch { case _: Malformed => None }

  /** A REAL little-endian uncompressed strip-organized RGB TIFF with
    * the [[PixelCodec.synthPng]] gradient — (x, y, x+y+seed) mod 256 —
    * so TIFF shares the pixel_stats closed-form oracle. Two strips, so
    * the strip-assembly path is in the proved path. */
  def synth(w: Int, h: Int, seed: Int): Array[Byte] = {
    require(w >= 1 && h >= 1)
    val rowBytes = w * 3
    val rowsPerStrip = math.max(1, (h + 1) / 2)
    val strips =
      (0 until h by rowsPerStrip).map(y0 => (y0, math.min(rowsPerStrip, h - y0)))
    val nTags = 10
    val ifdAt = 8
    val ifdSize = 2 + nTags * 12 + 4
    var extraAt = ifdAt + ifdSize // overflow area for >4-byte values
    def arr(n: Int, size: Int): Int = {
      val at = extraAt
      extraAt += n * size
      at
    }
    val bpsAt = arr(3, 2)
    val offsetsAt = if (strips.length > 1) arr(strips.length, 4) else -1
    val countsAt = if (strips.length > 1) arr(strips.length, 4) else -1
    val dataAt = extraAt
    val total = dataAt + h * rowBytes
    val out = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdAt)
    out.putShort(nTags.toShort)
    def tagShort(tag: Int, v: Int): Unit = {
      out.putShort(tag.toShort).putShort(3).putInt(1)
      out.putShort(v.toShort).putShort(0)
    }
    def tagLong(tag: Int, v: Int): Unit =
      out.putShort(tag.toShort).putShort(4).putInt(1).putInt(v)
    tagLong(256, w)
    tagLong(257, h)
    out.putShort(258).putShort(3).putInt(3).putInt(bpsAt) // BitsPerSample
    tagShort(259, 1) // no compression
    tagShort(262, 2) // RGB
    if (strips.length == 1) tagLong(273, dataAt)
    else out.putShort(273).putShort(4).putInt(strips.length).putInt(offsetsAt)
    tagShort(277, 3)
    tagLong(278, rowsPerStrip)
    if (strips.length == 1) tagLong(279, h * rowBytes)
    else out.putShort(279).putShort(4).putInt(strips.length).putInt(countsAt)
    tagShort(284, 1) // chunky
    out.putInt(0) // next IFD
    out.putShort(8).putShort(8).putShort(8) // bits per sample
    if (strips.length > 1) {
      strips.foreach { case (y0, _) => out.putInt(dataAt + y0 * rowBytes) }
      strips.foreach { case (_, rows) => out.putInt(rows * rowBytes) }
    }
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        out.put((x % 256).toByte).put((y % 256).toByte)
          .put(((x + y + seed) % 256).toByte)
        x += 1
      }
      y += 1
    }
    out.array()
  }
}
