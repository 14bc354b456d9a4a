package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import java.awt.image.BufferedImage
import javax.imageio.ImageIO

/** Baseline JPEG codec: DC-only streams decode to closed-form exact
  * pixels (the `jpeg_stats` oracle contract); full streams decode
  * within a small per-sample tolerance of the JDK's INDEPENDENT
  * ImageIO decoder on the same bytes (IDCT rounding is
  * implementation-defined — T.81 fixes the transform, not the
  * arithmetic), in both directions: our encoder → ImageIO decoder,
  * and ImageIO encoder → our decoder. */
class JpegCodecSpec extends AnyFunSuite {

  private def gradient(w: Int, h: Int): Array[Byte] = {
    // smooth image: keeps decoder differences to IDCT rounding, not
    // chroma-upsampling filter choice
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      rgb(o) = (x * 255 / math.max(1, w - 1)).toByte
      rgb(o + 1) = (y * 255 / math.max(1, h - 1)).toByte
      rgb(o + 2) = ((x + y) * 255 / math.max(1, w + h - 2)).toByte
    }
    rgb
  }

  private def toBuffered(w: Int, h: Int, rgb: Array[Byte]): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      img.setRGB(x, y, ((rgb(o) & 0xff) << 16) | ((rgb(o + 1) & 0xff) << 8) |
        (rgb(o + 2) & 0xff))
    }
    img
  }

  private def fromBuffered(img: BufferedImage): (Int, Int, Array[Byte]) = {
    val w = img.getWidth; val h = img.getHeight
    val rgb = new Array[Byte](w * h * 3)
    val gray = img.getRaster.getNumBands == 1
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      if (gray) {
        // getRGB on TYPE_BYTE_GRAY gamma-converts linear gray to sRGB;
        // raw raster samples are the decoded JPEG values
        val g = img.getRaster.getSample(x, y, 0).toByte
        rgb(o) = g; rgb(o + 1) = g; rgb(o + 2) = g
      } else {
        val p = img.getRGB(x, y)
        rgb(o) = ((p >> 16) & 0xff).toByte
        rgb(o + 1) = ((p >> 8) & 0xff).toByte
        rgb(o + 2) = (p & 0xff).toByte
      }
    }
    (w, h, rgb)
  }

  private def maxDiff(a: Array[Byte], b: Array[Byte]): Int = {
    require(a.length == b.length, s"length ${a.length} vs ${b.length}")
    var m = 0
    var i = 0
    while (i < a.length) {
      m = math.max(m, math.abs((a(i) & 0xff) - (b(i) & 0xff)))
      i += 1
    }
    m
  }

  test("DC-only blocks decode to the exact closed form 128 + dc*q/8") {
    val q = 16 // dc*16/8 = 2*dc: integer-exact for every dc
    val dc = Array(10, -20, 35, -60, 0, 55) // 3x2 blocks
    val bytes = JpegCodec.synthDcOnlyGray(3, 2, q, dc(_))
    val (w, h, rgb) = JpegCodec.decode(bytes).getOrElse(fail("decode failed"))
    assert((w, h) == (24, 16))
    for (by <- 0 until 2; bx <- 0 until 3) {
      val expected = 128 + 2 * dc(by * 3 + bx)
      for (y <- 0 until 8; x <- 0 until 8) {
        val o = ((by * 8 + y) * w + bx * 8 + x) * 3
        assert((rgb(o) & 0xff) == expected,
          s"block ($bx,$by) pixel ($x,$y)")
        assert(rgb(o) == rgb(o + 1) && rgb(o) == rgb(o + 2), "gray channels")
      }
    }
  }

  test("DC-only stream also matches the independent ImageIO decoder exactly") {
    // constant blocks have no IDCT rounding ambiguity, so even across
    // decoders the result must be identical
    val bytes = JpegCodec.synthDcOnlyGray(4, 3, 16, b => (b * 7) % 50 - 25)
    val ours = JpegCodec.decode(bytes).getOrElse(fail("our decode failed"))
    val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO rejected our DC-only stream")
    val theirs = fromBuffered(img)
    assert((ours._1, ours._2) == (theirs._1, theirs._2))
    assert(maxDiff(ours._3, theirs._3) == 0, "DC-only must be decoder-exact")
  }

  test("our encoder -> our decoder round-trips within quantization error") {
    for ((w, h, sub) <- Seq((32, 24, 1), (35, 21, 1), (32, 24, 2), (29, 17, 2))) {
      val src = gradient(w, h)
      val enc = JpegCodec.encodeRgb(src, w, h, 4, sub)
      val (dw, dh, dec) = JpegCodec.decode(enc)
        .getOrElse(fail(s"decode failed for ${(w, h, sub)}"))
      assert((dw, dh) == (w, h))
      // smooth gradient + fine quantizer: small loss end to end
      assert(maxDiff(src, dec) <= 12, s"excess loss for ${(w, h, sub)}")
    }
  }

  test("our encoder -> ImageIO decoder agrees with our decoder (4:4:4 + gray)") {
    val (w, h) = (40, 32)
    val enc444 = JpegCodec.encodeRgb(gradient(w, h), w, h, 3, 1)
    val gray = Array.tabulate(w * h)(i => (i % 251))
    val encG = JpegCodec.encodeGray(gray, w, h, 3)
    for (enc <- Seq(enc444, encG)) {
      val ours = JpegCodec.decode(enc).getOrElse(fail("our decode failed"))
      val img = ImageIO.read(new java.io.ByteArrayInputStream(enc))
      assert(img != null, "ImageIO rejected our stream")
      val theirs = fromBuffered(img)
      assert((ours._1, ours._2) == (theirs._1, theirs._2))
      // same compressed bytes, two decoders: differences are IDCT and
      // color-convert rounding only
      assert(maxDiff(ours._3, theirs._3) <= 3,
        s"decoders diverge by ${maxDiff(ours._3, theirs._3)}")
    }
  }

  test("ImageIO encoder -> our decoder (foreign Huffman tables, APP0, 4:2:0)") {
    val (w, h) = (48, 40)
    val src = gradient(w, h)
    val baos = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(toBuffered(w, h, src), "jpg", baos))
    val foreign = baos.toByteArray
    val ours = JpegCodec.decode(foreign)
      .getOrElse(fail("our decoder rejected an ImageIO stream"))
    assert((ours._1, ours._2) == (w, h))
    val img = ImageIO.read(new java.io.ByteArrayInputStream(foreign))
    val theirs = fromBuffered(img)
    // ImageIO's decoder may use a smoothing chroma upsampler where we
    // replicate; on a smooth gradient the difference stays small
    assert(maxDiff(ours._3, theirs._3) <= 8,
      s"diverges from ImageIO by ${maxDiff(ours._3, theirs._3)}")
  }

  test("restart intervals: RST markers, predictor resets, k cycling") {
    val dc = (b: Int) => (b * 11) % 60 - 30
    val plain = JpegCodec.decode(
      JpegCodec.synthDcOnlyGray(5, 4, 16, dc)).get
    // interval 3 over 20 MCUs: six RSTs, k wraps 0..5; interval 1 is
    // the densest case (reset before every MCU after the first)
    for (interval <- Seq(1, 3, 7)) {
      val withRst = JpegCodec.synthDcOnlyGray(5, 4, 16, dc, interval)
      val got = JpegCodec.decode(withRst)
        .getOrElse(fail(s"interval $interval rejected"))
      assert(got._3.toSeq == plain._3.toSeq, s"interval $interval")
      // the independent decoder agrees the stream is well-formed
      val img = ImageIO.read(new java.io.ByteArrayInputStream(withRst))
      assert(img != null, s"ImageIO rejected DRI=$interval stream")
      assert(fromBuffered(img)._3.toSeq == plain._3.toSeq)
    }
    // a stream claiming DRI but missing the marker must be rejected
    val withRst = JpegCodec.synthDcOnlyGray(5, 4, 16, dc, 3)
    val base = JpegCodec.synthDcOnlyGray(5, 4, 16, dc)
    // graft the DRI header onto the restart-free entropy data: scan
    // for the DRI segment bytes in withRst and splice into base
    val dri = Array(0xff, 0xdd, 0x00, 0x04, 0x00, 0x03).map(_.toByte)
    val spliced = base.take(2) ++ dri ++ base.drop(2)
    assert(JpegCodec.decode(spliced).isEmpty, "missing RST must fail")
  }

  test("malformed inputs return None, never throw") {
    assert(JpegCodec.decode(Array.empty[Byte]).isEmpty)
    assert(JpegCodec.decode("not a jpeg".getBytes).isEmpty)
    assert(JpegCodec.decode(Multimodal.Synth.jpeg(10, 10)).isEmpty,
      "header-only prefix has no scan data")
    val good = JpegCodec.synthDcOnlyGray(2, 2, 16, _ => 5)
    assert(JpegCodec.decode(good.take(good.length / 2)).isEmpty, "truncated")
    // progressive SOF2 must be declined, not mis-decoded
    val prog = good.clone()
    // find the SOF0 marker and rewrite to SOF2
    val sofAt = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    assert(JpegCodec.decode(prog).isEmpty, "progressive must return None")
  }

  test("decodePixels routes well-formed JPEG to the real decoder") {
    val bytes = JpegCodec.synthDcOnlyGray(2, 2, 16, b => b * 10)
    val (w, h, rgb) = PixelCodec.decodePixels(bytes)
      .getOrElse(fail("dispatch failed"))
    assert((w, h) == (16, 16))
    val (_, _, feats, real) = Multimodal.decodeFeatures(bytes)
    assert(real, "well-formed JPEG now decodes for real")
    assert(rgb.length == w * h * 3)
  }
}
