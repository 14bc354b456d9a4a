package graft.operators

import java.util.zip.{CRC32, Deflater, Inflater}

/** Real pixel decode for the codec-free container: PNG, BMP and GIF
  * are the raster formats whose full decode needs no codec library —
  * PNG is zlib (JDK Inflater) plus five per-scanline prediction
  * filters (PNG spec §9, RFC 2083), BMP is raw padded rows, GIF is
  * LZW (GIF89a spec appendix F) over an indexed palette, implemented
  * here bit-exactly including 9→12-bit code growth, deferred-clear
  * table-full behavior, and 4-pass interlacing. Only the LOSSY
  * formats (JPEG/WebP — DCT/VP8) stay behind [[Multimodal.decodeStub]]:
  * their inverse transforms are decoder-implementation-defined at the
  * rounding level, so a first-party decode could not be oracle-exact.
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

  /** Decode the first frame of a GIF87a/GIF89a image: palette lookup
    * over a full LZW decompression of the image data, honoring local
    * color tables and the 4-pass interlace row order. Extensions
    * (graphic control, comments, application) are skipped; later
    * frames of an animation are ignored — frame 1 is the still. The
    * frame must COVER the logical screen (offset 0,0, same dims):
    * optimized/animated GIFs whose first frame is a partial patch are
    * refused rather than decoded into pixels inconsistent with the
    * header dims other consumers report. Returns None on any
    * malformed structure. */
  def decodeGif(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (bytes.length < 13) return None
    val hdr = new String(bytes, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (hdr != "GIF87a" && hdr != "GIF89a") return None
    def le16(p: Int): Int = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
    val screenW = le16(6); val screenH = le16(8)
    val packed = bytes(10) & 0xff
    var pos = 13
    var globalPal: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 3 * (1 << ((packed & 7) + 1))
      if (pos + n > bytes.length) return None
      globalPal = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
      pos += n
    }
    // walk blocks to the first image descriptor
    while (pos < bytes.length) {
      (bytes(pos) & 0xff) match {
        case 0x3b => return None // trailer before any image
        case 0x21 => // extension: label + sub-blocks
          pos += 2
          while (pos < bytes.length && bytes(pos) != 0)
            pos += 1 + (bytes(pos) & 0xff)
          if (pos >= bytes.length) return None
          pos += 1 // block terminator
        case 0x2c =>
          if (pos + 10 > bytes.length) return None
          val left = le16(pos + 1); val top = le16(pos + 3)
          val w = le16(pos + 5); val h = le16(pos + 7)
          // only FULL-frame stills decode here: a frame at an offset or
          // smaller than the logical screen (optimized/animated GIFs)
          // would make these pixels geometrically inconsistent with the
          // header dims every other consumer (imageDims, resize) reports
          // — refuse honestly and let callers fall back, the same
          // posture as PNG Adam7
          if (left != 0 || top != 0 || w != screenW || h != screenH)
            return None
          val ip = bytes(pos + 9) & 0xff
          pos += 10
          var pal = globalPal
          if ((ip & 0x80) != 0) { // local color table wins
            val n = 3 * (1 << ((ip & 7) + 1))
            if (pos + n > bytes.length) return None
            pal = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
            pos += n
          }
          if (pal == null || w <= 0 || h <= 0 ||
              w.toLong * h > 64L * 1024 * 1024) return None
          if (pos >= bytes.length) return None
          val minCode = bytes(pos) & 0xff
          pos += 1
          if (minCode < 2 || minCode > 8) return None
          // concatenate data sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          while (pos < bytes.length && bytes(pos) != 0) {
            val n = bytes(pos) & 0xff
            if (pos + 1 + n > bytes.length) return None
            data.write(bytes, pos + 1, n)
            pos += 1 + n
          }
          if (pos >= bytes.length) return None
          val idx = gifLzwDecode(data.toByteArray, minCode, w * h)
            .getOrElse(return None)
          val rgb = new Array[Byte](w * h * 3)
          val nColors = pal.length / 3
          var i = 0 // STORED row index; deinterlaceRow maps it to display
          while (i < h) {
            val dispRow = if ((ip & 0x40) != 0) deinterlaceRow(i, h) else i
            var x = 0
            while (x < w) {
              val ci = idx(i * w + x) & 0xff
              if (ci >= nColors) return None
              val d = (dispRow * w + x) * 3
              rgb(d) = pal(ci * 3)
              rgb(d + 1) = pal(ci * 3 + 1)
              rgb(d + 2) = pal(ci * 3 + 2)
              x += 1
            }
            i += 1
          }
          return Some((w, h, rgb))
        case _ => return None
      }
    }
    None
  }

  /** Output row for interlace pass order (GIF89a spec appendix E):
    * stored row i of an h-row interlaced image lands at this display
    * row — passes start at 0,4,2,1 with strides 8,8,4,2. */
  private[operators] def deinterlaceRow(i: Int, h: Int): Int = {
    val p1 = (h + 7) / 8          // rows 0, 8, 16, ...
    val p2 = (h + 3) / 8          // rows 4, 12, ...
    val p3 = (h + 1) / 4          // rows 2, 6, ...
    if (i < p1) i * 8
    else if (i < p1 + p2) 4 + (i - p1) * 8
    else if (i < p1 + p2 + p3) 2 + (i - p1 - p2) * 4
    else 1 + (i - p1 - p2 - p3) * 2
  }

  /** GIF-flavor LZW decode: codes packed LSB-first, width grows from
    * minCode+1 up to 12 bits as the table fills, CLEAR resets, table
    * stops growing at 4096 (deferred clear — decode continues with the
    * frozen table). Returns exactly `expect` palette indices, or None
    * on a malformed stream. */
  private[operators] def gifLzwDecode(data: Array[Byte], minCode: Int,
      expect: Int): Option[Array[Byte]] = {
    val clear = 1 << minCode
    val end = clear + 1
    // table as (prefix link, suffix byte): entry strings are walked
    // back-to-front through prefix links — O(1) per added entry, no
    // per-entry array copies on a 4096-entry table
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val out = new Array[Byte](expect)
    var outN = 0
    var next = end + 1
    var width = minCode + 1
    var prev = -1
    var acc = 0L; var accBits = 0; var di = 0
    val tail = new Array[Byte](4096) // scratch for reversed entry walk
    def emit(code: Int): Int = { // returns first byte of the entry
      var c = code; var n = 0
      while (c >= clear) { tail(n) = suffix(c); n += 1; c = prefix(c) }
      val first = c // literal at the root of the prefix chain
      if (outN + n + 1 > expect) return -1
      out(outN) = first.toByte; outN += 1
      var i = n - 1
      while (i >= 0) { out(outN) = tail(i); outN += 1; i -= 1 }
      first & 0xff
    }
    def firstCharOf(code: Int): Int = {
      var c = code
      while (c >= clear) c = prefix(c)
      c
    }
    while (outN < expect) {
      while (accBits < width) {
        if (di >= data.length) return None // truncated
        acc |= (data(di) & 0xffL) << accBits
        accBits += 8; di += 1
      }
      val code = (acc & ((1 << width) - 1)).toInt
      acc >>>= width; accBits -= width
      if (code == clear) { next = end + 1; width = minCode + 1; prev = -1 }
      else if (code == end) return if (outN == expect) Some(out) else None
      else if (prev == -1) {
        if (code >= clear) return None // first code must be a literal
        out(outN) = code.toByte; outN += 1
        prev = code
      } else {
        // either an existing entry, or (KwKwK) the one being defined now
        if (code > next || (code == next && next >= 4096)) return None
        // adding the entry BEFORE emitting makes the KwKwK case
        // (code == next: prev's string + prev's first char) uniform
        val first = firstCharOf(if (code == next) prev else code)
        if (next < 4096) {
          prefix(next) = prev; suffix(next) = first.toByte
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        if (emit(code) < 0) return None // over-long output: malformed
        prev = code
      }
    }
    Some(out)
  }

  /** Dispatch: PNG, BMP, GIF, baseline JPEG and (late r8) lossless
    * WebP (VP8L, [[WebpCodec]]) decode for real; every other payload →
    * None (caller falls back to the labeled stub). JPEG pixels are
    * [[JpegCodec]]-deterministic (its scaladoc covers the
    * cross-decoder rounding caveat lossless formats don't have). */
  def decodePixels(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    if (bytes == null || bytes.length < 2) None
    else if ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P') decodePng(bytes)
    else if (bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
    else if (bytes(0) == 'G' && bytes(1) == 'I') decodeGif(bytes)
    else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
      JpegCodec.decode(bytes)
    else if (bytes(0) == 'R' && bytes(1) == 'I') WebpCodec.decode(bytes)
    else if ((bytes(0) == 'I' && bytes(1) == 'I') ||
      (bytes(0) == 'M' && bytes(1) == 'M')) TiffCodec.decode(bytes)
    else if (bytes.length >= 4 && bytes(0) == 0 && bytes(1) == 0 &&
      (bytes(2) == 1 || bytes(2) == 2) && bytes(3) == 0)
      IcoCodec.decode(bytes)
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

  /** GIF-flavor LZW ENCODE of palette indices: a real dictionary
    * compressor (hash-map of (prefix code, byte) → code), emitting
    * codes LSB-first with the decoder-matched width schedule — the
    * encoder bumps width when `next == (1 << width) + 1`, one later
    * than the decoder's `next == 1 << width`, because the decoder adds
    * its table entry one code behind the encoder. A CLEAR is emitted
    * when the table approaches full. Exercised against [[gifLzwDecode]]
    * by randomized round-trip property tests. */
  private[operators] def gifLzwEncode(indices: Array[Byte],
      minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val end = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L; var accBits = 0
    var width = minCode + 1
    def put(code: Int): Unit = {
      acc |= code.toLong << accBits
      accBits += width
      while (accBits >= 8) {
        out.write((acc & 0xff).toInt); acc >>>= 8; accBits -= 8
      }
    }
    val dict = new java.util.HashMap[Integer, Integer](4096)
    var next = end + 1
    def reset(): Unit = { dict.clear(); next = end + 1 }
    put(clear)
    if (indices.nonEmpty) {
      var cur: Int = indices(0) & 0xff
      var i = 1
      while (i < indices.length) {
        val px = indices(i) & 0xff
        val key = (cur << 8) | px
        val hit = dict.get(key)
        if (hit != null) cur = hit
        else {
          put(cur)
          dict.put(key, next); next += 1
          if (next == (1 << width) + 1 && width < 12) width += 1
          if (next >= 4095) { // table nearly full: clear both sides
            put(clear); reset(); width = minCode + 1
          }
          cur = px
        }
        i += 1
      }
      put(cur)
      // the decoder adds one more table entry on receiving this final
      // code and may cross a width boundary BEFORE reading END — mirror
      // that accounting or END arrives one bit narrow
      next += 1
      if (next == (1 << width) + 1 && width < 12) width += 1
    }
    put(end)
    if (accBits > 0) out.write((acc & 0xff).toInt)
    out.toByteArray
  }

  /** GIF89a container framing around already-encoded indices: gray
    * 256-ramp global palette, one full-frame image descriptor,
    * ≤255-byte data sub-blocks — ONE writer shared by [[synthGif]] and
    * the interlace test fixture, so container layout can't diverge
    * from the path the decoder is tested against. */
  private[operators] def assembleGif(w: Int, h: Int, indices: Array[Byte],
      interlace: Boolean): Array[Byte] = {
    val lzw = gifLzwEncode(indices, minCode = 8)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    le16(w); le16(h)
    out.write(0x80 | 7) // global color table, 2^8 entries
    out.write(0); out.write(0)
    var c = 0
    while (c < 256) { out.write(c); out.write(c); out.write(c); c += 1 }
    out.write(0x2c) // image descriptor: full frame, no local table
    le16(0); le16(0); le16(w); le16(h)
    out.write(if (interlace) 0x40 else 0)
    out.write(8) // LZW min code size
    var off = 0
    while (off < lzw.length) { // ≤255-byte data sub-blocks
      val n = math.min(255, lzw.length - off)
      out.write(n); out.write(lzw, off, n)
      off += n
    }
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** A REAL compressed GIF89a: grayscale gradient v = x + y + seed over
    * a 256-entry gray ramp palette, LZW-compressed by [[gifLzwEncode]].
    * Caller keeps w + h + seed < 257 so no channel wraps and the
    * channel sums have the closed form h·w(w−1)/2 + w·h(h−1)/2 + w·h·seed
    * (identical for R, G and B — the palette is gray). */
  def synthGif(w: Int, h: Int, seed: Int): Array[Byte] = {
    require(w + h + seed < 257, "gradient must not wrap mod 256")
    val idx = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { idx(y * w + x) = (x + y + seed).toByte; x += 1 }
      y += 1
    }
    assembleGif(w, h, idx, interlace = false)
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
