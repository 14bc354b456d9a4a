package graft.operators

/** ICO (favicon) decode — the web's most-fetched image format after
  * the big four. The container (ICONDIR + ICONDIRENTRYs) holds one
  * image per size; each entry is either a PNG (modern, ≥ Vista) —
  * routed through the conformance-proven [[PixelCodec.decodePng]] —
  * or a DIB: a BITMAPINFOHEADER whose height covers the XOR bitmap
  * AND the 1-bit AND mask, with 32/24-bit direct color or 8/4/1-bit
  * palette rows, all bottom-up and 4-byte padded.
  *
  * Decode picks the BEST entry (largest area, then deepest color) —
  * what a thumbnailer wants. The AND mask is parsed but not applied:
  * output is packed RGB (the [[PixelCodec]] interchange shape drops
  * alpha for every format). Cursors (type 2) decode identically.
  *
  * The reference gets favicon metadata via Tika; here decode is
  * first-party, so `image/vnd.microsoft.icon` payloads reach
  * [[Multimodal.decodeFeatures]] with real pixels. */
object IcoCodec {

  private final class Malformed
    extends RuntimeException(null, null, false, false)
  private def bad(): Nothing = throw new Malformed

  private def u16(d: Array[Byte], p: Int): Int = {
    if (p + 2 > d.length) bad()
    (d(p) & 0xff) | ((d(p + 1) & 0xff) << 8)
  }
  private def u32(d: Array[Byte], p: Int): Long =
    u16(d, p).toLong | (u16(d, p + 2).toLong << 16)

  private final case class Entry(w: Int, h: Int, bpp: Int, size: Int,
      offset: Int)

  private def entries(d: Array[Byte]): Seq[Entry] = {
    if (d.length < 6 || u16(d, 0) != 0) bad()
    val typ = u16(d, 2)
    if (typ != 1 && typ != 2) bad()
    val n = u16(d, 4)
    if (n == 0 || n > 256) bad()
    (0 until n).map { i =>
      val at = 6 + i * 16
      if (at + 16 > d.length) bad()
      val w0 = d(at) & 0xff
      val h0 = d(at + 1) & 0xff
      Entry(if (w0 == 0) 256 else w0, if (h0 == 0) 256 else h0,
        u16(d, at + 6), u32(d, at + 8).toInt, u32(d, at + 12).toInt)
    }
  }

  /** Largest-area dims among the entries (the header-only path). */
  def dims(bytes: Array[Byte]): Option[(Int, Int)] =
    try {
      if (bytes == null) return None
      val best = entries(bytes).maxBy(e => (e.w.toLong * e.h, e.bpp))
      Some((best.w, best.h))
    } catch { case _: Malformed => None }

  private def decodeDib(d: Array[Byte], entW: Int,
      entH: Int): (Int, Int, Array[Byte]) = {
    if (u32(d, 0) != 40) bad() // BITMAPINFOHEADER only (no PNG here)
    val w = u32(d, 4).toInt
    val hRaw = u32(d, 8).toInt
    val bpp = u16(d, 14)
    if (u32(d, 16) != 0) bad() // BI_RGB only
    // height counts XOR + AND masks; some writers store just the XOR
    val h = if (hRaw == entH * 2 || entH == 0) hRaw / 2 else entH
    if (w <= 0 || h <= 0 || w.toLong * h > (1 << 24)) bad()
    val palN = if (bpp <= 8) {
      val declared = u32(d, 32).toInt
      if (declared > 0) declared else 1 << bpp
    } else 0
    val palAt = 40
    val pixAt = palAt + palN * 4
    val rowBytes = ((w * bpp + 31) / 32) * 4
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val src = pixAt + (h - 1 - y) * rowBytes // bottom-up
      var x = 0
      while (x < w) {
        val (r, g, b) = bpp match {
          case 32 =>
            val p = src + x * 4
            if (p + 4 > d.length) bad()
            ((d(p + 2) & 0xff), (d(p + 1) & 0xff), (d(p) & 0xff))
          case 24 =>
            val p = src + x * 3
            if (p + 3 > d.length) bad()
            ((d(p + 2) & 0xff), (d(p + 1) & 0xff), (d(p) & 0xff))
          case 8 | 4 | 1 =>
            val bitAt = x * bpp
            val byteAt = src + (bitAt >> 3)
            if (byteAt >= d.length) bad()
            val shift = 8 - bpp - (bitAt & 7)
            val idx = ((d(byteAt) & 0xff) >> shift) & ((1 << bpp) - 1)
            if (idx >= palN) bad()
            val p = palAt + idx * 4 // BGRA palette entries
            ((d(p + 2) & 0xff), (d(p + 1) & 0xff), (d(p) & 0xff))
          case _ => bad()
        }
        val o = (y * w + x) * 3
        rgb(o) = r.toByte; rgb(o + 1) = g.toByte; rgb(o + 2) = b.toByte
        x += 1
      }
      y += 1
    }
    (w, h, rgb)
  }

  /** Decode the best entry to packed RGB. */
  def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    try {
      if (bytes == null) return None
      val es = entries(bytes)
        .filter(e => e.offset >= 0 && e.size > 8 &&
          e.offset.toLong + e.size <= bytes.length)
      if (es.isEmpty) return None
      val best = es.maxBy(e => (e.w.toLong * e.h, e.bpp))
      val payload = java.util.Arrays.copyOfRange(bytes, best.offset,
        best.offset + best.size)
      if ((payload(0) & 0xff) == 0x89 && payload(1) == 'P')
        PixelCodec.decodePng(payload) // modern PNG-compressed entry
      else Some(decodeDib(payload, best.w, best.h))
    } catch {
      case _: Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
    }

  /** A real .ico: one 32-bit DIB entry plus one PNG entry, pixels from
    * the shared gradient formula. The decoder must pick the LARGER
    * (PNG) entry. */
  def synth(wSmall: Int, wLarge: Int, seed: Int): Array[Byte] = {
    def gradient(w: Int, h: Int): Array[Byte] = {
      val rgb = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        val o = (y * w + x) * 3
        rgb(o) = (x % 256).toByte
        rgb(o + 1) = (y % 256).toByte
        rgb(o + 2) = ((x + y + seed) % 256).toByte
      }
      rgb
    }
    // DIB entry: 32bpp XOR + empty AND mask, bottom-up
    val sw = wSmall
    val dibRow = sw * 4
    val andRow = ((sw + 31) / 32) * 4
    val dib = java.nio.ByteBuffer
      .allocate(40 + dibRow * sw + andRow * sw)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    dib.putInt(40).putInt(sw).putInt(sw * 2).putShort(1).putShort(32)
      .putInt(0).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
    val g = gradient(sw, sw)
    for (y <- (sw - 1) to 0 by -1; x <- 0 until sw) {
      val o = (y * sw + x) * 3
      dib.put(g(o + 2)).put(g(o + 1)).put(g(o)).put(0xff.toByte)
    }
    val dibBytes = dib.array()
    val png = PixelCodec.synthPng(wLarge, wLarge, seed)
    val out = java.nio.ByteBuffer
      .allocate(6 + 32 + dibBytes.length + png.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.putShort(0).putShort(1).putShort(2)
    out.put((sw & 0xff).toByte).put((sw & 0xff).toByte).put(0.toByte)
      .put(0.toByte).putShort(1).putShort(32)
      .putInt(dibBytes.length).putInt(6 + 32)
    out.put((wLarge & 0xff).toByte).put((wLarge & 0xff).toByte)
      .put(0.toByte).put(0.toByte).putShort(1).putShort(32)
      .putInt(png.length).putInt(6 + 32 + dibBytes.length)
    out.put(dibBytes).put(png)
    out.array()
  }
}
