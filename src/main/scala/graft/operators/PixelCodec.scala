package graft.operators

import java.util.zip.{CRC32, Deflater, Inflater}

/** Real pixel decode for the codec-free container: PNG and BMP are the
  * two raster formats whose full decode needs no codec library — PNG is
  * zlib (JDK Inflater) plus five per-scanline prediction filters (PNG
  * spec §9, RFC 2083), BMP is raw padded rows. JPEG/GIF/WebP stay
  * behind [[Multimodal.decodeStub]] (DCT/LZW/VP8 are genuine codecs).
  *
  * The reference delegates image parsing to an external library
  * (src/plugin/parse-tika); here the decode is first-party so the
  * feature-extraction plumbing ([[Multimodal.extract]]) can produce
  * REAL channel statistics for the formats that allow it, with the
  * same batch shape either way.
  *
  * Decoded form: (width, height, rgb) with rgb packed row-major
  * 3 bytes/pixel — grayscale is replicated, alpha dropped.
  */
object PixelCodec {

  /** PNG Paeth predictor (spec §9.4) — exact integer form. */
  def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a)
    val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Decode a non-interlaced 8-bit PNG of color type 0 (gray), 2 (RGB)
    * or 6 (RGBA). Returns None for other layouts, truncated streams, or
    * malformed zlib data — callers treat None as "not decodable here",
    * falling back to header-only metadata. */
  def decodePng(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (bytes.length < 8 + 25) return None
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    var i = 0
    while (i < 8) { if ((bytes(i) & 0xff) != (sig(i) & 0xff)) return None; i += 1 }
    def be32(p: Int): Int =
      ((bytes(p) & 0xff) << 24) | ((bytes(p + 1) & 0xff) << 16) |
        ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
    def fourcc(p: Int): String =
      new String(bytes, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
    // walk chunks: IHDR first, concatenate IDATs, stop at IEND
    var pos = 8
    var w = 0; var h = 0; var colorType = -1; var ok = false
    val idat = new java.io.ByteArrayOutputStream()
    while (pos + 8 <= bytes.length) {
      val len = be32(pos)
      val typ = fourcc(pos + 4)
      val dataStart = pos + 8
      // long arithmetic: a crafted len near Int.MaxValue must fail the
      // bounds check, not wrap negative and index out of bounds
      if (len < 0 || dataStart.toLong + len > bytes.length) return None
      typ match {
        case "IHDR" =>
          if (len < 13) return None
          w = be32(dataStart); h = be32(dataStart + 4)
          val bitDepth = bytes(dataStart + 8) & 0xff
          colorType = bytes(dataStart + 9) & 0xff
          val interlace = bytes(dataStart + 12) & 0xff
          if (bitDepth != 8 || interlace != 0 ||
              !(colorType == 0 || colorType == 2 || colorType == 6))
            return None
          if (w <= 0 || h <= 0 || w.toLong * h > 64L * 1024 * 1024)
            return None
        case "IDAT" => idat.write(bytes, dataStart, len)
        case "IEND" => ok = true
        case _ => () // ancillary chunks skipped
      }
      pos = dataStart + len + 4 // skip CRC
      if (ok) pos = bytes.length
    }
    if (colorType < 0 || idat.size() == 0) return None
    val channels = colorType match { case 0 => 1; case 2 => 3; case _ => 4 }
    val stride = w * channels
    val raw = new Array[Byte](h * (1 + stride))
    val inflater = new Inflater()
    try {
      inflater.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, off, raw.length - off)
        if (n == 0 && inflater.needsInput()) return None // truncated
        off += n
      }
      if (off < raw.length) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inflater.end()
    // unfilter in place into `img` (spec §9: left/up/avg/paeth operate
    // on the RECONSTRUCTED bytes, one filter byte per scanline)
    val img = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val ft = raw(y * (1 + stride)) & 0xff
      val rowIn = y * (1 + stride) + 1
      val rowOut = y * stride
      var x = 0
      while (x < stride) {
        val cur = raw(rowIn + x) & 0xff
        val left = if (x >= channels) img(rowOut + x - channels) & 0xff else 0
        val up = if (y > 0) img(rowOut - stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= channels)
          img(rowOut - stride + x - channels) & 0xff else 0
        val rec = ft match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + ((left + up) >> 1)
          case 4 => cur + paeth(left, up, ul)
          case _ => return None
        }
        img(rowOut + x) = (rec & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Some((w, h, toRgb(img, w, h, channels)))
  }

  /** Decode an uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB).
    * Positive height = bottom-up rows (the common layout), negative =
    * top-down; rows are BGR, padded to 4 bytes. */
  def decodeBmp(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    def le16(p: Int): Int = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
    def le32(p: Int): Int = le16(p) | (le16(p + 2) << 16)
    val dataOffset = le32(10)
    val headerSize = le32(14)
    if (headerSize < 40 || dataOffset < 54) return None
    val w = le32(18)
    val hRaw = le32(22)
    // Int.MinValue survives math.abs negative — reject it explicitly
    if (hRaw == Int.MinValue) return None
    val bottomUp = hRaw > 0
    val h = math.abs(hRaw)
    val bpp = le16(28)
    val compression = le32(30)
    if (bpp != 24 || compression != 0 || w <= 0 || h == 0 ||
        w.toLong * h > 64L * 1024 * 1024) return None
    val rowSize = ((w * 3 + 3) / 4) * 4
    if (dataOffset.toLong + rowSize.toLong * h > bytes.length) return None
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = dataOffset + rowSize * (if (bottomUp) h - 1 - y else y)
      var x = 0
      while (x < w) {
        val s = srcRow + x * 3
        val d = (y * w + x) * 3
        rgb(d) = bytes(s + 2) // BGR -> RGB
        rgb(d + 1) = bytes(s + 1)
        rgb(d + 2) = bytes(s)
        x += 1
      }
      y += 1
    }
    Some((w, h, rgb))
  }

  /** Dispatch: PNG and BMP decode for real; every other payload → None
    * (caller falls back to the labeled stub). */
  def decodePixels(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    if (bytes == null || bytes.length < 2) None
    else if ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P') decodePng(bytes)
    else if (bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
    else None

  private def toRgb(img: Array[Byte], w: Int, h: Int,
      channels: Int): Array[Byte] = {
    if (channels == 3) return img
    val rgb = new Array[Byte](w * h * 3)
    var p = 0
    while (p < w * h) {
      if (channels == 1) {
        val g = img(p)
        rgb(p * 3) = g; rgb(p * 3 + 1) = g; rgb(p * 3 + 2) = g
      } else { // RGBA: drop alpha
        rgb(p * 3) = img(p * 4)
        rgb(p * 3 + 1) = img(p * 4 + 1)
        rgb(p * 3 + 2) = img(p * 4 + 2)
      }
      p += 1
    }
    rgb
  }

  /** Integer-exact per-channel sums over decoded RGB — the primitive
    * both the feature vector and the pixel_stats oracle build on. */
  def channelSums(rgb: Array[Byte]): (Long, Long, Long) = {
    var r = 0L; var g = 0L; var b = 0L
    var i = 0
    while (i < rgb.length) {
      r += rgb(i) & 0xff; g += rgb(i + 1) & 0xff; b += rgb(i + 2) & 0xff
      i += 3
    }
    (r, g, b)
  }

  /** Real 8-float feature vector from decoded pixels: per-channel means
    * and standard deviations, mean luma (ITU-R BT.601 integer weights),
    * aspect ratio. Same shape as the stub's vector, so MediaFeatures
    * consumers are agnostic to which path produced a row. */
  def pixelFeatures(w: Int, h: Int, rgb: Array[Byte]): Array[Float] = {
    val n = (w.toLong * h).max(1L)
    var sr = 0L; var sg = 0L; var sb = 0L
    var qr = 0L; var qg = 0L; var qb = 0L
    var sl = 0L
    var i = 0
    while (i < rgb.length) {
      val r = rgb(i) & 0xff; val g = rgb(i + 1) & 0xff; val b = rgb(i + 2) & 0xff
      sr += r; sg += g; sb += b
      qr += r.toLong * r; qg += g.toLong * g; qb += b.toLong * b
      sl += (299L * r + 587L * g + 114L * b) / 1000L
      i += 3
    }
    def mean(s: Long) = s.toDouble / n
    def std(s: Long, q: Long) = {
      val m = mean(s)
      math.sqrt(math.max(0.0, q.toDouble / n - m * m))
    }
    Array(mean(sr).toFloat, mean(sg).toFloat, mean(sb).toFloat,
      std(sr, qr).toFloat, std(sg, qg).toFloat, std(sb, qb).toFloat,
      mean(sl).toFloat, (w.toDouble / h).toFloat)
  }

  /** Nearest-neighbor scale of packed RGB — the classic integer
    * sampling grid (sx = x·w div ow), exact and deterministic. */
  def scaleRgb(rgb: Array[Byte], w: Int, h: Int, ow: Int,
      oh: Int): Array[Byte] = {
    val out = new Array[Byte](ow * oh * 3)
    var y = 0
    while (y < oh) {
      val sy = (y.toLong * h / oh).toInt
      var x = 0
      while (x < ow) {
        val sx = (x.toLong * w / ow).toInt
        val s = (sy * w + sx) * 3
        val d = (y * ow + x) * 3
        out(d) = rgb(s); out(d + 1) = rgb(s + 1); out(d + 2) = rgb(s + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Encode packed RGB as a 24-bit bottom-up BMP — the trivially
    * encodable interchange container (no compressor needed), so a
    * real resize can emit a real, decodable payload. */
  def encodeBmp(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    val rowSize = ((w * 3 + 3) / 4) * 4
    val dataSize = rowSize * h
    val out = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54)
    out.putInt(40).putInt(w).putInt(h)
      .putShort(1).putShort(24).putInt(0).putInt(dataSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var yOut = 0
    while (yOut < h) {
      val y = h - 1 - yOut // bottom row first
      var x = 0
      while (x < w) {
        val s = (y * w + x) * 3
        out.put(rgb(s + 2)).put(rgb(s + 1)).put(rgb(s)) // RGB -> BGR
        x += 1
      }
      var pad = w * 3
      while (pad < rowSize) { out.put(0.toByte); pad += 1 }
      yOut += 1
    }
    out.array()
  }

  // ==== encoders: deterministic full-image fixtures (Synth family) ====

  /** A REAL compressed PNG (8-bit RGB, non-interlaced) whose pixel at
    * (x, y) is (x mod 256, y mod 256, (x+y+seed) mod 256) — closed-form
    * channel sums for the oracle. The scanline filter cycles y mod 5,
    * so one image exercises every PNG filter type through the decoder. */
  def synthPng(w: Int, h: Int, seed: Int): Array[Byte] = {
    val stride = w * 3
    val raw = new Array[Byte](h * (1 + stride))
    val img = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val d = y * stride + x * 3
        img(d) = (x % 256).toByte
        img(d + 1) = (y % 256).toByte
        img(d + 2) = ((x + y + seed) % 256).toByte
        x += 1
      }
      // filter the row (encoder side of spec §9): filtered = raw - pred
      val ft = y % 5
      raw(y * (1 + stride)) = ft.toByte
      var i = 0
      while (i < stride) {
        val cur = img(y * stride + i) & 0xff
        val left = if (i >= 3) img(y * stride + i - 3) & 0xff else 0
        val up = if (y > 0) img((y - 1) * stride + i) & 0xff else 0
        val ul = if (y > 0 && i >= 3) img((y - 1) * stride + i - 3) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) >> 1
          case _ => paeth(left, up, ul)
        }
        raw(y * (1 + stride) + 1 + i) = ((cur - pred) & 0xff).toByte
        i += 1
      }
      y += 1
    }
    assemblePng(w, h, colorType = 2, interlace = 0, raw)
  }

  /** Deflate + chunk-frame raw (filtered) scanlines into a PNG file —
    * shared by [[synthPng]] and test fixtures building exotic layouts
    * (gray/RGBA/interlaced), so chunk framing has ONE implementation. */
  private[graft] def assemblePng(w: Int, h: Int, colorType: Int,
      interlace: Int, raw: Array[Byte]): Array[Byte] = {
    val deflater = new Deflater()
    deflater.setInput(raw)
    deflater.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) zout.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(12 + data.length)
      out.putInt(data.length).put(typ.getBytes("ASCII")).put(data)
      val crc = new CRC32()
      crc.update(typ.getBytes("ASCII")); crc.update(data)
      out.putInt(crc.getValue.toInt)
      out.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(interlace.toByte).array()
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", zout.toByteArray) ++
      chunk("IEND", Array.empty)
  }

  /** A 24-bit bottom-up BMP with the same pixel formula as [[synthPng]],
    * so PNG and BMP rows share one oracle closed form. */
  def synthBmp(w: Int, h: Int, seed: Int): Array[Byte] = {
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val d = (y * w + x) * 3
        rgb(d) = (x % 256).toByte
        rgb(d + 1) = (y % 256).toByte
        rgb(d + 2) = ((x + y + seed) % 256).toByte
        x += 1
      }
      y += 1
    }
    encodeBmp(w, h, rgb)
  }
}
