package graft.operators

/** First-party WebP-lossless (VP8L) decoder — the last raster format
  * the engine previously kept behind a labeled stub. VP8L is fully
  * LOSSLESS (Huffman + LZ77 + reversible pixel transforms; no DCT), so
  * unlike lossy VP8 a first-party decode can be bit-exact with the
  * reference implementation, and [[Multimodal.decodeFeatures]] can
  * produce real channel statistics for `image/webp` payloads.
  *
  * Implemented from the public "WebP Lossless Bitstream Specification"
  * and conformance-tested against the system libwebp: the committed
  * fixtures under src/test/resources/webp/ were encoded AND
  * ground-truth-decoded by libwebp 7.1.5 (tools/make_webp_fixtures.py),
  * chosen to exercise every decoder path — all four transforms
  * (predictor, cross-color, subtract-green, color-indexing with every
  * pixel-bundling width), color cache, LZ77 backward references
  * including the 2D near-distance map, meta-Huffman group images on
  * large inputs, and native alpha. The 120-entry near-distance table
  * itself was derived EMPIRICALLY from libwebp by
  * tools/derive_webp_dist_table.py (hand-crafted one-reference probe
  * streams, decoded by libwebp, copy source read back) rather than
  * transcribed, so it cannot be mis-remembered.
  *
  * The reference (apache/nutch) delegates all image parsing to Tika
  * (src/plugin/parse-tika); this engine decodes first-party so the
  * multimodal feature path needs no external codec at 100 TB scale.
  *
  * Scope: the lossy VP8 flavor stays behind the labeled stub (its
  * inverse DCT+loop-filter is decoder-implementation-defined at the
  * rounding level; no oracle-exact story). Animated WebP: only the
  * still VP8L chunk of a VP8X container is decoded.
  *
  * All entry points return None on any malformed structure rather than
  * throwing — callers fall back to header-only metadata.
  */
object WebpCodec {

  /** Internal control-flow for malformed streams; converted to None at
    * the public boundary. Stackless: raised on hostile/truncated input
    * in a hot path. */
  private final class Malformed
    extends RuntimeException(null, null, false, false)
  private def bad(): Nothing = throw new Malformed

  // ---- bit reader: VP8L packs bits LSB-first within bytes ----

  private final class Br(data: Array[Byte], var bytePos: Int) {
    private var acc = 0L
    private var cnt = 0
    def read(n: Int): Int = {
      while (cnt < n) {
        if (bytePos >= data.length) bad()
        acc |= (data(bytePos) & 0xffL) << cnt
        bytePos += 1; cnt += 8
      }
      val v = (acc & ((1L << n) - 1)).toInt
      acc >>>= n; cnt -= n
      v
    }
  }

  // ---- canonical Huffman (DEFLATE-style code assignment; codes are
  //      matched MSB-first against the LSB-first bit stream) ----

  private val MaxCodeLen = 15

  private final class Huff(lengths: Array[Int]) {
    // single-symbol codes read ZERO bits (spec: simple codes with one
    // symbol; normal codes degenerate to one used symbol)
    private var nSyms = 0
    private var i = 0
    while (i < lengths.length) { if (lengths(i) > 0) nSyms += 1; i += 1 }
    val single: Int =
      if (nSyms == 1) lengths.indexWhere(_ > 0) else -1
    if (nSyms == 0) bad() // a code that can emit nothing is malformed
    private val count = new Array[Int](MaxCodeLen + 1)
    private val firstCode = new Array[Int](MaxCodeLen + 1)
    private val firstIdx = new Array[Int](MaxCodeLen + 1)
    private val ordered = new Array[Int](nSyms)
    if (single < 0) {
      i = 0
      while (i < lengths.length) {
        val l = lengths(i)
        if (l > 0) { if (l > MaxCodeLen) bad(); count(l) += 1 }
        i += 1
      }
      var code = 0; var idx = 0; var kraft = 0L; var len = 1
      while (len <= MaxCodeLen) {
        code = (code + count(len - 1)) << 1
        firstCode(len) = code
        firstIdx(len) = idx
        idx += count(len)
        kraft += count(len).toLong << (MaxCodeLen - len)
        len += 1
      }
      if (kraft != 1L << MaxCodeLen) bad() // over/under-subscribed
      // symbols in canonical order: by (length, symbol)
      val fill = new Array[Int](MaxCodeLen + 1)
      i = 0
      while (i < lengths.length) {
        val l = lengths(i)
        if (l > 0) { ordered(firstIdx(l) + fill(l)) = i; fill(l) += 1 }
        i += 1
      }
    }
    def next(br: Br): Int = {
      if (single >= 0) return single
      var code = 0; var len = 0
      while (len < MaxCodeLen) {
        code = (code << 1) | br.read(1)
        len += 1
        val c = count(len)
        if (c > 0 && code >= firstCode(len) && code - firstCode(len) < c)
          return ordered(firstIdx(len) + code - firstCode(len))
      }
      bad()
    }
  }

  /** Order in which code-length-code lengths are transmitted (spec). */
  private val ClOrder = Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9,
    10, 11, 12, 13, 14, 15)

  /** Decoder-path coverage bits, accumulated per decode — lets
    * WebpCodecSpec PROVE (not claim) that the libwebp-encoded fixture
    * set exercises every feature of the format. */
  object Feature {
    val PredictorTf = 1      // transform type 0
    val ColorTf = 2          // transform type 1
    val SubGreenTf = 4       // transform type 2
    val PaletteTf = 8        // transform type 3
    val ColorCache = 16      // cache declared
    val CacheHit = 32        // cache-reference symbol decoded
    val MetaHuffman = 64     // >1 Huffman group via meta image
    val Lz77Near = 128       // backward ref through the 2D distance map
    val Lz77Linear = 256     // backward ref with a plain distance
    val SimpleCode = 512     // 1-2-symbol inline Huffman code
    val NormalCode = 1024    // code-length-coded Huffman code
    val PixelBundling = 2048 // palette with packed sub-byte indices
  }

  private final class Ctx { var feats = 0 }

  private def readHuffCode(alphabet: Int, br: Br, ctx: Ctx): Huff = {
    if (br.read(1) == 1) { // "simple" code: 1 or 2 symbols, inline
      ctx.feats |= Feature.SimpleCode
      val numSyms = br.read(1) + 1
      val s0 = br.read(if (br.read(1) == 1) 8 else 1)
      if (s0 >= alphabet) bad()
      val lengths = new Array[Int](alphabet)
      lengths(s0) = 1
      if (numSyms == 2) {
        val s1 = br.read(8)
        if (s1 >= alphabet || s1 == s0) bad()
        lengths(s1) = 1
      }
      new Huff(lengths)
    } else { // normal: code lengths themselves Huffman-coded
      ctx.feats |= Feature.NormalCode
      val numCl = 4 + br.read(4)
      val clLens = new Array[Int](19)
      var i = 0
      while (i < numCl) { clLens(ClOrder(i)) = br.read(3); i += 1 }
      val clHuff = new Huff(clLens)
      val lengths = new Array[Int](alphabet)
      var maxSymbol =
        if (br.read(1) == 1) {
          val nbits = 2 + 2 * br.read(3)
          val m = 2 + br.read(nbits)
          if (m > alphabet) bad()
          m
        } else alphabet
      var sym = 0
      var prevLen = 8 // spec: repeat-previous starts from 8
      while (sym < alphabet && maxSymbol > 0) {
        maxSymbol -= 1
        val cl = clHuff.next(br)
        if (cl < 16) {
          lengths(sym) = cl; sym += 1
          if (cl != 0) prevLen = cl
        } else {
          val (repeat, fillLen) = cl match {
            case 16 => (3 + br.read(2), prevLen)
            case 17 => (3 + br.read(3), 0)
            case _  => (11 + br.read(7), 0) // 18
          }
          if (sym + repeat > alphabet) bad()
          var r = 0
          while (r < repeat) { lengths(sym) = fillLen; sym += 1; r += 1 }
        }
      }
      new Huff(lengths)
    }
  }

  // ---- LZ77 prefix values and the 2D near-distance map ----

  /** Length/distance prefix decode: codes 0-3 are the values 1-4;
    * above that, (code-2)>>1 extra bits. */
  private def prefixVal(code: Int, br: Br): Int =
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extra
      offset + br.read(extra) + 1
    }

  /** Distance codes 1..120 map to 2D (dx, dy) screen offsets, packed
    * here as (dy << 8) | (dx + 8). Derived empirically from libwebp
    * 7.1.5 by tools/derive_webp_dist_table.py — each entry pinned by a
    * probe stream libwebp itself decoded — not transcribed from the
    * spec text. */
  private val DistMap: Array[Int] = Array(
    0x108, 0x009, 0x109, 0x107, 0x208, 0x00a, 0x209, 0x207, 0x10a, 0x106,
    0x20a, 0x206, 0x308, 0x00b, 0x309, 0x307, 0x10b, 0x105, 0x30a, 0x306,
    0x20b, 0x205, 0x408, 0x00c, 0x409, 0x407, 0x10c, 0x104, 0x30b, 0x305,
    0x40a, 0x406, 0x20c, 0x204, 0x508, 0x40b, 0x405, 0x30c, 0x304, 0x00d,
    0x509, 0x507, 0x10d, 0x103, 0x50a, 0x506, 0x20d, 0x203, 0x40c, 0x404,
    0x50b, 0x505, 0x30d, 0x303, 0x608, 0x00e, 0x609, 0x607, 0x10e, 0x102,
    0x60a, 0x606, 0x20e, 0x202, 0x50c, 0x504, 0x40d, 0x403, 0x60b, 0x605,
    0x30e, 0x302, 0x708, 0x00f, 0x709, 0x707, 0x50d, 0x503, 0x10f, 0x101,
    0x60c, 0x604, 0x40e, 0x402, 0x70a, 0x706, 0x20f, 0x201, 0x70b, 0x705,
    0x30f, 0x301, 0x60d, 0x603, 0x50e, 0x502, 0x010, 0x70c, 0x704, 0x40f,
    0x401, 0x110, 0x210, 0x60e, 0x602, 0x310, 0x70d, 0x703, 0x50f, 0x501,
    0x410, 0x70e, 0x702, 0x60f, 0x601, 0x510, 0x70f, 0x701, 0x610, 0x710)

  private def mapDist(distCode: Int, w: Int): Int =
    if (distCode > 120) distCode - 120
    else {
      val v = DistMap(distCode - 1)
      val d = (v >> 8) * w + ((v & 0xff) - 8)
      if (d < 1) 1 else d
    }

  // ---- transforms ----

  /** ceil(size / 2^bits) — dimensions of transform sub-images. */
  private def sub(size: Int, bits: Int): Int =
    (size + (1 << bits) - 1) >> bits

  private sealed trait Transform { def width: Int } // width its inverse RESTORES
  private final case class PredictorT(width: Int, bits: Int,
      img: Array[Int]) extends Transform
  private final case class ColorT(width: Int, bits: Int,
      img: Array[Int]) extends Transform
  private final case class SubGreenT(width: Int) extends Transform
  private final case class PaletteT(width: Int, widthBits: Int,
      palette: Array[Int]) extends Transform

  // ---- per-channel pixel arithmetic on packed ARGB ints ----

  /** Channel-wise add mod 256 (no cross-channel carry). */
  private def addPx(a: Int, b: Int): Int = {
    val rb = (a & 0x00ff00ff) + (b & 0x00ff00ff)
    val ag = ((a >>> 8) & 0x00ff00ff) + ((b >>> 8) & 0x00ff00ff)
    ((ag & 0x00ff00ff) << 8) | (rb & 0x00ff00ff)
  }

  /** Channel-wise floor average. */
  private def avg2(a: Int, b: Int): Int =
    (((a ^ b) & 0xfefefefe) >>> 1) + (a & b)

  private def clamp255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  /** Predictor 11: return L or T, whichever is closer (Manhattan over
    * channels) to the gradient estimate L + T - TL. */
  private def select(l: Int, t: Int, tl: Int): Int = {
    var pl = 0; var pt = 0
    var sh = 0
    while (sh < 32) {
      val cl = (l >>> sh) & 0xff
      val ct = (t >>> sh) & 0xff
      val ctl = (tl >>> sh) & 0xff
      val p = cl + ct - ctl
      pl += math.abs(p - cl)
      pt += math.abs(p - ct)
      sh += 8
    }
    if (pl < pt) l else t
  }

  /** Predictor 12: per-channel clamp(L + T - TL). */
  private def clampAddSubFull(l: Int, t: Int, tl: Int): Int = {
    var out = 0
    var sh = 0
    while (sh < 32) {
      val v = clamp255(((l >>> sh) & 0xff) + ((t >>> sh) & 0xff) -
        ((tl >>> sh) & 0xff))
      out |= v << sh
      sh += 8
    }
    out
  }

  /** Predictor 13: per-channel clamp(a + (a - b) / 2) with a =
    * avg(L, T); division truncates toward zero (C semantics). */
  private def clampAddSubHalf(l: Int, t: Int, tl: Int): Int = {
    val ave = avg2(l, t)
    var out = 0
    var sh = 0
    while (sh < 32) {
      val a = (ave >>> sh) & 0xff
      val b = (tl >>> sh) & 0xff
      out |= clamp255(a + (a - b) / 2) << sh
      sh += 8
    }
    out
  }

  /** (t * c) >> 5 with both operands sign-extended from 8 bits —
    * the cross-color transform delta (arithmetic shift). */
  private def ctDelta(t: Int, c: Int): Int = (t.toByte * c.toByte) >> 5

  // ---- the entropy-coded image decoder (shared by the spatial image
  //      and every transform/meta sub-image) ----

  /** Decode one entropy-coded image of w×h ARGB pixels. `level0` turns
    * on the transform list and the meta-Huffman image; sub-images have
    * neither, but DO have their own optional color cache. */
  private def decodeImageStream(w0: Int, h: Int, level0: Boolean,
      br: Br, ctx: Ctx): (Int, Array[Int], List[Transform]) = {
    var w = w0
    var transforms: List[Transform] = Nil
    if (level0) {
      var seen = 0
      while (br.read(1) == 1) {
        val ttype = br.read(2)
        if ((seen & (1 << ttype)) != 0) bad() // each at most once
        seen |= 1 << ttype
        ctx.feats |= 1 << ttype // Feature.{Predictor,Color,SubGreen,Palette}Tf
        ttype match {
          case 0 => // predictor: per-block modes in a sub-image
            val bits = br.read(3) + 2
            val (_, img, _) =
              decodeImageStream(sub(w, bits), sub(h, bits), false, br, ctx)
            transforms ::= PredictorT(w, bits, img)
          case 1 => // cross-color: per-block ColorTransformElements
            val bits = br.read(3) + 2
            val (_, img, _) =
              decodeImageStream(sub(w, bits), sub(h, bits), false, br, ctx)
            transforms ::= ColorT(w, bits, img)
          case 2 =>
            transforms ::= SubGreenT(w)
          case 3 => // color indexing (palette) + pixel bundling
            val size = br.read(8) + 1
            val (_, palRaw, _) = decodeImageStream(size, 1, false, br, ctx)
            // palette entries are delta-coded off the previous entry
            var i = 1
            while (i < size) { palRaw(i) = addPx(palRaw(i), palRaw(i - 1)); i += 1 }
            val widthBits =
              if (size <= 2) 3 else if (size <= 4) 2
              else if (size <= 16) 1 else 0
            transforms ::= PaletteT(w, widthBits, palRaw)
            if (widthBits > 0) ctx.feats |= Feature.PixelBundling
            w = sub(w, widthBits) // subsequent stages see the packed width
        }
      }
    }
    // color cache (all levels)
    val cacheBits =
      if (br.read(1) == 1) {
        val b = br.read(4)
        if (b < 1 || b > 11) bad()
        b
      } else 0
    if (cacheBits > 0) ctx.feats |= Feature.ColorCache
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = if (cacheBits > 0) new Array[Int](cacheSize) else null
    // meta-Huffman image (level0 only): per-block Huffman group indices
    var metaImg: Array[Int] = null
    var metaBits = 0
    var metaW = 0
    var numGroups = 1
    if (level0 && br.read(1) == 1) {
      metaBits = br.read(3) + 2
      metaW = sub(w, metaBits)
      val (_, img, _) =
        decodeImageStream(metaW, sub(h, metaBits), false, br, ctx)
      metaImg = img
      ctx.feats |= Feature.MetaHuffman
      var i = 0
      while (i < img.length) {
        val g = (img(i) >>> 8) & 0xffff
        if (g + 1 > numGroups) numGroups = g + 1
        i += 1
      }
    }
    // Huffman groups: 5 codes each — green(+len+cache), red, blue,
    // alpha, distance
    val greenAlpha = 256 + 24 + cacheSize
    val groups = new Array[Array[Huff]](numGroups)
    var gi = 0
    while (gi < numGroups) {
      groups(gi) = Array(
        readHuffCode(greenAlpha, br, ctx), readHuffCode(256, br, ctx),
        readHuffCode(256, br, ctx), readHuffCode(256, br, ctx),
        readHuffCode(40, br, ctx))
      gi += 1
    }
    // pixel loop
    if (w <= 0 || h <= 0 || w.toLong * h > 64L * 1024 * 1024) bad()
    val n = w * h
    val argb = new Array[Int](n)
    var pos = 0
    var x = 0
    def insert(px: Int): Unit =
      if (cache != null)
        cache((0x1e35a7bd * px) >>> (32 - cacheBits)) = px
    while (pos < n) {
      val grp =
        if (metaImg == null) groups(0)
        else {
          val y = pos / w
          val e = metaImg((y >> metaBits) * metaW + (x >> metaBits))
          val g = (e >>> 8) & 0xffff
          groups(g)
        }
      val green = grp(0).next(br)
      if (green < 256) { // literal: green, red, blue, alpha in that order
        val r = grp(1).next(br)
        val b = grp(2).next(br)
        val a = grp(3).next(br)
        val px = (a << 24) | (r << 16) | (green << 8) | b
        argb(pos) = px; insert(px)
        pos += 1; x += 1; if (x == w) x = 0
      } else if (green < 256 + 24) { // LZ77 backward reference
        val len = prefixVal(green - 256, br)
        val distCode = prefixVal(grp(4).next(br), br)
        ctx.feats |=
          (if (distCode > 120) Feature.Lz77Linear else Feature.Lz77Near)
        val dist = mapDist(distCode, w)
        if (dist > pos || pos + len > n) bad()
        var k = 0
        while (k < len) {
          val px = argb(pos - dist)
          argb(pos) = px; insert(px)
          pos += 1; x += 1; if (x == w) x = 0
          k += 1
        }
      } else { // color cache hit
        ctx.feats |= Feature.CacheHit
        val idx = green - 256 - 24
        if (cache == null || idx >= cacheSize) bad()
        val px = cache(idx)
        argb(pos) = px
        pos += 1; x += 1; if (x == w) x = 0
      }
    }
    (w, argb, transforms)
  }

  // ---- inverse transforms ----

  private def invPredictor(argb: Array[Int], w: Int, h: Int, bits: Int,
      img: Array[Int]): Unit = {
    val tw = sub(w, bits)
    var y = 0
    var i = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pred =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) argb(i - 1) // top row: left
          else if (x == 0) argb(i - w) // left column: top
          else {
            val mode = (img((y >> bits) * tw + (x >> bits)) >>> 8) & 0xff
            val l = argb(i - 1)
            val t = argb(i - w)
            val tl = argb(i - w - 1)
            // at the last column this reads the CURRENT row's first
            // pixel (already reconstructed) — the contiguous-buffer
            // behavior encoders rely on
            val tr = argb(i - w + 1)
            mode match {
              case 0  => 0xff000000
              case 1  => l
              case 2  => t
              case 3  => tr
              case 4  => tl
              case 5  => avg2(avg2(l, tr), t)
              case 6  => avg2(l, tl)
              case 7  => avg2(l, t)
              case 8  => avg2(tl, t)
              case 9  => avg2(t, tr)
              case 10 => avg2(avg2(l, tl), avg2(t, tr))
              case 11 => select(l, t, tl)
              case 12 => clampAddSubFull(l, t, tl)
              case 13 => clampAddSubHalf(l, t, tl)
              case _  => bad()
            }
          }
        argb(i) = addPx(argb(i), pred)
        x += 1; i += 1
      }
      y += 1
    }
  }

  private def invColor(argb: Array[Int], w: Int, h: Int, bits: Int,
      img: Array[Int]): Unit = {
    val tw = sub(w, bits)
    var y = 0
    var i = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val cte = img((y >> bits) * tw + (x >> bits))
        val g2r = cte & 0xff          // blue channel
        val g2b = (cte >>> 8) & 0xff  // green channel
        val r2b = (cte >>> 16) & 0xff // red channel
        val px = argb(i)
        val g = (px >>> 8) & 0xff
        var r = ((px >>> 16) & 0xff) + ctDelta(g2r, g)
        r &= 0xff
        var b = (px & 0xff) + ctDelta(g2b, g) + ctDelta(r2b, r)
        b &= 0xff
        argb(i) = (px & 0xff00ff00) | (r << 16) | b
        x += 1; i += 1
      }
      y += 1
    }
  }

  private def invSubGreen(argb: Array[Int]): Unit = {
    var i = 0
    while (i < argb.length) {
      val px = argb(i)
      val g = (px >>> 8) & 0xff
      val r = (((px >>> 16) & 0xff) + g) & 0xff
      val b = ((px & 0xff) + g) & 0xff
      argb(i) = (px & 0xff00ff00) | (r << 16) | b
      i += 1
    }
  }

  private def invPalette(argb: Array[Int], packedW: Int, h: Int,
      fullW: Int, widthBits: Int, palette: Array[Int]): Array[Int] = {
    if (widthBits == 0) {
      var i = 0
      while (i < argb.length) {
        val idx = (argb(i) >>> 8) & 0xff
        if (idx >= palette.length) bad()
        argb(i) = palette(idx)
        i += 1
      }
      argb
    } else {
      val bpp = 8 >> widthBits // bits per packed index
      val mask = (1 << bpp) - 1
      val out = new Array[Int](fullW * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < fullW) {
          val packed = argb(y * packedW + (x >> widthBits))
          val shift = (x & ((1 << widthBits) - 1)) * bpp
          val idx = (((packed >>> 8) & 0xff) >> shift) & mask
          if (idx >= palette.length) bad()
          out(y * fullW + x) = palette(idx)
          x += 1
        }
        y += 1
      }
      out
    }
  }

  // ---- public surface ----

  /** Decode a WebP container holding a VP8L chunk to (w, h, ARGB).
    * Lossy VP8 and anything malformed → None. */
  def decodeArgb(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] =
    decodeArgbFeatures(bytes).map { case (w, h, px, _) => (w, h, px) }

  /** [[decodeArgb]] plus the [[Feature]] coverage bitmask this stream
    * exercised — the spec's proof that the conformance fixtures span
    * the format. */
  private[operators] def decodeArgbFeatures(
      bytes: Array[Byte]): Option[(Int, Int, Array[Int], Int)] = {
    try {
      if (bytes == null || bytes.length < 20) return None
      def ascii(p: Int, s: String): Boolean =
        p + s.length <= bytes.length && s.indices.forall(i => bytes(p + i) == s(i))
      def le32(p: Int): Int =
        (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8) |
          ((bytes(p + 2) & 0xff) << 16) | ((bytes(p + 3) & 0xff) << 24)
      if (!ascii(0, "RIFF") || !ascii(8, "WEBP")) return None
      // chunk walk: VP8L directly, or inside a VP8X extended container
      var pos = 12
      var payload = -1
      var payloadLen = 0
      while (payload < 0 && pos + 8 <= bytes.length) {
        val size = le32(pos + 4)
        if (size < 0 || pos + 8 + size.toLong > bytes.length) return None
        if (ascii(pos, "VP8L")) { payload = pos + 8; payloadLen = size }
        else if (ascii(pos, "VP8X") || ascii(pos, "ALPH") ||
          ascii(pos, "ICCP") || ascii(pos, "EXIF") || ascii(pos, "XMP "))
          pos += 8 + size + (size & 1) // skip metadata chunks
        else return None // VP8 (lossy), ANIM, unknown: not decodable here
      }
      if (payload < 0) return None
      val br = new Br(bytes, payload)
      if (br.read(8) != 0x2f) return None // VP8L signature
      val w = br.read(14) + 1
      val h = br.read(14) + 1
      br.read(1) // alpha hint (informational)
      if (br.read(3) != 0) return None // version must be 0
      if (w.toLong * h > 64L * 1024 * 1024) return None
      val ctx = new Ctx
      val (decodedW, pixels0, transforms) =
        decodeImageStream(w, h, true, br, ctx)
      // apply inverse transforms in reverse order of their appearance;
      // each entry records the width its inverse restores
      var pixels = pixels0
      var curW = decodedW
      var ts = transforms // head = LAST transform read = first inverse
      while (ts.nonEmpty) {
        ts.head match {
          case PredictorT(tw, bits, img) =>
            if (tw != curW) bad()
            invPredictor(pixels, tw, h, bits, img)
          case ColorT(tw, bits, img) =>
            if (tw != curW) bad()
            invColor(pixels, tw, h, bits, img)
          case SubGreenT(tw) =>
            if (tw != curW) bad()
            invSubGreen(pixels)
          case PaletteT(tw, widthBits, palette) =>
            pixels = invPalette(pixels, curW, h, tw, widthBits, palette)
            curW = tw
        }
        ts = ts.tail
      }
      if (curW != w) bad()
      Some((w, h, pixels, ctx.feats))
    } catch { case _: Malformed => None }
  }

  /** Decode to packed RGB bytes (alpha dropped), the [[PixelCodec]]
    * interchange shape. */
  def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    decodeArgb(bytes).map { case (w, h, argb) =>
      val rgb = new Array[Byte](w * h * 3)
      var i = 0
      while (i < argb.length) {
        val px = argb(i)
        rgb(i * 3) = ((px >>> 16) & 0xff).toByte
        rgb(i * 3 + 1) = ((px >>> 8) & 0xff).toByte
        rgb(i * 3 + 2) = (px & 0xff).toByte
        i += 1
      }
      (w, h, rgb)
    }

  // ==== encoder: deterministic synth fixture (oracle side) ====

  /** LSB-first bit writer mirroring [[Br]]. */
  private final class Bw {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var cnt = 0
    def put(v: Int, n: Int): Unit = {
      acc |= (v.toLong & ((1L << n) - 1)) << cnt
      cnt += n
      while (cnt >= 8) { out.write((acc & 0xff).toInt); acc >>>= 8; cnt -= 8 }
    }
    /** Huffman code: MSB-first bit by bit into the LSB-first stream. */
    def putCode(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { put((code >> i) & 1, 1); i -= 1 }
    }
    def bytes(): Array[Byte] = {
      if (cnt > 0) { out.write((acc & 0xff).toInt); acc = 0; cnt = 0 }
      out.toByteArray
    }
  }

  /** Emit a normal Huffman code whose 256 literal symbols all have
    * length 8 (canonical ⇒ code(s) = s) and whose `zeroTail` trailing
    * symbols (length/cache codes) are unused. The code-length code has
    * two length-1 symbols: '8' and '18' (zero-run). */
  private def putFlat8(b: Bw, zeroTail: Int): Unit = {
    require(zeroTail == 0 || (zeroTail >= 11 && zeroTail <= 138))
    b.put(0, 1) // not simple
    b.put(8, 4) // num_code_lengths = 12 → CL order prefix [17,18,0..5,16,6,7,8]
    val clLens = // 3-bit CL lengths in transmission order
      if (zeroTail == 0) Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1)
      else Array(0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1)
    clLens.foreach(b.put(_, 3))
    b.put(0, 1) // no max_symbol
    if (zeroTail == 0) {
      // single CL symbol '8' → zero-bit reads; 256 lengths implied
    } else {
      // CL canonical over {8, 18}: code(8) = 0, code(18) = 1
      var i = 0
      while (i < 256) { b.putCode(0, 1); i += 1 } // 256 × length 8
      b.putCode(1, 1); b.put(zeroTail - 11, 7)    // 18: run of zeros
    }
  }

  private def putSimpleSingle(b: Bw, sym: Int): Unit = {
    b.put(1, 1) // simple
    b.put(0, 1) // one symbol
    b.put(1, 1) // 8-bit form
    b.put(sym, 8)
  }

  /** A REAL VP8L stream with the [[PixelCodec.synthPng]] pixel formula
    * — (x mod 256, y mod 256, (x+y+seed) mod 256) — so PNG, BMP and
    * WebP synth rows share one closed-form oracle. Literals-only
    * encoding: no transforms, no cache, flat 8-bit codes for each
    * channel (24 bits/pixel), alpha and distance as single-symbol
    * codes. Validated against libwebp (tools/check_webp_synth.py
    * decodes a sample through the system decoder). */
  def synth(w: Int, h: Int, seed: Int): Array[Byte] = {
    require(w >= 1 && h >= 1 && w <= 16384 && h <= 16384)
    val b = new Bw
    b.put(0x2f, 8)
    b.put(w - 1, 14)
    b.put(h - 1, 14)
    b.put(0, 1) // no alpha
    b.put(0, 3) // version
    b.put(0, 1) // no transforms
    b.put(0, 1) // no color cache
    b.put(0, 1) // no meta-Huffman
    putFlat8(b, 24) // green: 256 literals + 24 unused length codes
    putFlat8(b, 0)  // red
    putFlat8(b, 0)  // blue
    putSimpleSingle(b, 255) // alpha: always 255, zero bits
    putSimpleSingle(b, 0)   // distance: unused, zero bits
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        b.putCode(y % 256, 8)       // green first
        b.putCode(x % 256, 8)       // red
        b.putCode((x + y + seed) % 256, 8) // blue
        x += 1
      }
      y += 1
    }
    val payload = b.bytes()
    val pad = payload.length & 1 // RIFF: chunks pad to even, size excludes pad
    val out = java.nio.ByteBuffer.allocate(20 + payload.length + pad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("ASCII")).putInt(12 + payload.length + pad)
      .put("WEBPVP8L".getBytes("ASCII")).putInt(payload.length)
      .put(payload)
    if (pad == 1) out.put(0.toByte)
    out.array()
  }
}
