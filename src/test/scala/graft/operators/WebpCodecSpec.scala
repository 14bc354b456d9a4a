package graft.operators

/** VP8L decoder conformance: every committed fixture under
  * test/resources/webp was encoded by the SYSTEM libwebp (the
  * reference implementation) and its ground-truth pixels captured by
  * libwebp's own decoder (tools/make_webp_fixtures.py), so these
  * byte-exact comparisons check our decoder against an independent
  * implementation — not a self-round-trip. The fixture set makes
  * libwebp emit every decoder path: all four transforms, every
  * pixel-bundling width, color cache, LZ77 with 2D near distances,
  * meta-Huffman groups, native alpha.
  */
class WebpCodecSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/webp/$name")
    require(in != null, s"missing fixture $name")
    try in.readAllBytes()
    finally in.close()
  }

  private val manifest: Seq[(String, Int, Int)] =
    new String(resource("MANIFEST.txt"), "UTF-8").linesIterator.map { l =>
      val p = l.split(" ")
      (p(0), p(1).toInt, p(2).toInt)
    }.toSeq

  test("fixture set is the full designed matrix") {
    assert(manifest.size == 16)
    assert(manifest.map(_._1).contains("alpha_80x60"))
  }

  for ((name, w, h) <- manifest)
    test(s"decodes libwebp-encoded $name byte-exactly vs libwebp's own decode") {
      val Some((dw, dh, argb)) = WebpCodec.decodeArgb(resource(s"$name.webp"))
      assert((dw, dh) == (w, h))
      val expected = resource(s"$name.rgba") // R,G,B,A per pixel
      assert(expected.length == w * h * 4)
      var i = 0
      var mismatch = -1
      while (i < w * h && mismatch < 0) {
        val px = argb(i)
        if (((px >>> 16) & 0xff) != (expected(i * 4) & 0xff) ||
          ((px >>> 8) & 0xff) != (expected(i * 4 + 1) & 0xff) ||
          (px & 0xff) != (expected(i * 4 + 2) & 0xff) ||
          ((px >>> 24) & 0xff) != (expected(i * 4 + 3) & 0xff)) mismatch = i
        i += 1
      }
      assert(mismatch == -1, s"first pixel mismatch at index $mismatch " +
        s"(x=${mismatch % w}, y=${mismatch / w})")
    }

  test("fixture set exercises EVERY decoder path (feature bitmask union)") {
    import WebpCodec.Feature._
    val union = manifest.map { case (name, _, _) =>
      val Some((_, _, _, feats)) =
        WebpCodec.decodeArgbFeatures(resource(s"$name.webp"))
      feats
    }.reduce(_ | _)
    val all = PredictorTf | ColorTf | SubGreenTf | PaletteTf | ColorCache |
      CacheHit | MetaHuffman | Lz77Near | Lz77Linear | SimpleCode |
      NormalCode | PixelBundling
    val missing = all & ~union
    assert(missing == 0,
      s"decoder paths never reached by any fixture: bits 0x${missing.toHexString}")
  }

  test("synth stream decodes to the closed-form gradient") {
    for ((w, h, seed) <- Seq((17, 9, 5), (1, 1, 0), (40, 23, 96), (300, 2, 7))) {
      val bytes = WebpCodec.synth(w, h, seed)
      val Some((dw, dh, rgb)) = WebpCodec.decode(bytes)
      assert((dw, dh) == (w, h))
      for (y <- 0 until h; x <- 0 until w) {
        val o = (y * w + x) * 3
        assert((rgb(o) & 0xff) == x % 256, s"r at ($x,$y)")
        assert((rgb(o + 1) & 0xff) == y % 256, s"g at ($x,$y)")
        assert((rgb(o + 2) & 0xff) == (x + y + seed) % 256, s"b at ($x,$y)")
      }
    }
  }

  test("synth round-trips across randomized dims and seeds") {
    val rnd = new scala.util.Random(0xbeef)
    for (_ <- 1 to 40) {
      val w = 1 + rnd.nextInt(70)
      val h = 1 + rnd.nextInt(40)
      val seed = rnd.nextInt(256)
      val Some((dw, dh, rgb)) = WebpCodec.decode(WebpCodec.synth(w, h, seed))
      assert((dw, dh) == (w, h))
      val probes = Seq((0, 0), (w - 1, 0), (0, h - 1), (w - 1, h - 1),
        (w / 2, h / 2))
      for ((x, y) <- probes) {
        val o = (y * w + x) * 3
        assert((rgb(o) & 0xff) == x % 256)
        assert((rgb(o + 1) & 0xff) == y % 256)
        assert((rgb(o + 2) & 0xff) == (x + y + seed) % 256)
      }
    }
  }

  test("synth channel sums match the pixel_stats closed form") {
    val (w, h, seed) = (21, 13, 4)
    val Some((_, _, rgb)) = PixelCodec.decodePixels(WebpCodec.synth(w, h, seed))
    val (sr, sg, sb) = PixelCodec.channelSums(rgb)
    assert(sr == h.toLong * w * (w - 1) / 2)
    assert(sg == w.toLong * h * (h - 1) / 2)
    assert(sb == sr + sg + w.toLong * h * seed)
  }

  test("decodePixels dispatches RIFF payloads to the VP8L decoder") {
    val Some((w, h, _)) = PixelCodec.decodePixels(resource("tiles_64x64.webp"))
    assert((w, h) == (64, 64))
  }

  test("multimodal sniff still types the synth stream as image/webp") {
    assert(Multimodal.sniff(WebpCodec.synth(9, 9, 1)) == "image/webp")
  }

  test("malformed and unsupported inputs return None, never throw") {
    val good = resource("gradient_64x48.webp")
    assert(WebpCodec.decodeArgb(null).isEmpty)
    assert(WebpCodec.decodeArgb(Array[Byte](1, 2, 3)).isEmpty)
    // every truncation of a valid file must fail cleanly
    for (n <- 0 until good.length)
      assert(WebpCodec.decodeArgb(good.take(n)).isEmpty, s"truncated at $n")
    // flipped signature byte
    val sig = good.clone(); sig(20) = 0x30
    assert(WebpCodec.decodeArgb(sig).isEmpty)
    // lossy fourcc is out of scope -> None
    val lossy = good.clone()
    lossy(15) = ' ' // "VP8L" -> "VP8 "
    assert(WebpCodec.decodeArgb(lossy).isEmpty)
    // bit noise over the entropy stream: None or a decode, never a throw
    for (i <- 22 until good.length) {
      val fuzz = good.clone()
      fuzz(i) = (fuzz(i) ^ 0x55).toByte
      WebpCodec.decodeArgb(fuzz) // must not throw
    }
  }

  test("decode drops alpha into packed RGB") {
    val Some((w, h, rgb)) = WebpCodec.decode(resource("alpha_80x60.webp"))
    assert((w, h) == (80, 60))
    val expected = resource("alpha_80x60.rgba")
    for (i <- 0 until w * h; c <- 0 until 3)
      assert((rgb(i * 3 + c) & 0xff) == (expected(i * 4 + c) & 0xff))
  }
}
