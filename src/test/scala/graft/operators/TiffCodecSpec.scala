package graft.operators

import java.awt.image.BufferedImage
import javax.imageio.{ImageIO, ImageWriteParam}

import org.scalatest.funsuite.AnyFunSuite

/** TIFF codec conformance against the JDK's INDEPENDENT ImageIO TIFF
  * plugin, in both directions: ImageIO-encoded files at every
  * compression we support (None/LZW/PackBits/Deflate/ZLib, gray and
  * RGB, forced multi-strip) must decode raster-exactly, and our synth
  * stream must read back identically through ImageIO. TIFF is
  * lossless, so everything is byte-exact — including the LZW
  * early-change convention, which an off-by-one would break on the
  * very first width bump. */
class TiffCodecSpec extends AnyFunSuite {

  private def gradient(w: Int, h: Int, seed: Int): Array[Byte] = {
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      rgb(o) = (x % 256).toByte
      rgb(o + 1) = (y % 256).toByte
      rgb(o + 2) = ((x + y + seed) % 256).toByte
    }
    rgb
  }

  private def noisy(w: Int, h: Int, seed: Int): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    val rgb = new Array[Byte](w * h * 3)
    rnd.nextBytes(rgb)
    rgb
  }

  private def toBuffered(w: Int, h: Int, rgb: Array[Byte],
      gray: Boolean): BufferedImage = {
    val img = new BufferedImage(w, h,
      if (gray) BufferedImage.TYPE_BYTE_GRAY else BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      if (gray) img.getRaster.setSample(x, y, 0, rgb(o) & 0xff)
      else img.setRGB(x, y, ((rgb(o) & 0xff) << 16) |
        ((rgb(o + 1) & 0xff) << 8) | (rgb(o + 2) & 0xff))
    }
    img
  }

  private def imageioTiff(img: BufferedImage, compression: Option[String],
      rowsPerStrip: Int = -1): Array[Byte] = {
    val w = ImageIO.getImageWritersByFormatName("tiff").next()
    val out = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    w.setOutput(ios)
    val p = w.getDefaultWriteParam
    compression.foreach { c =>
      p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionType(c)
    }
    if (rowsPerStrip > 0) {
      p.setTilingMode(ImageWriteParam.MODE_EXPLICIT)
      // ImageIO maps full-width tiles of height N onto strips
      p.setTiling(img.getWidth, rowsPerStrip, 0, 0)
    }
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close()
    w.dispose()
    out.toByteArray
  }

  private def assertDecodes(bytes: Array[Byte], w: Int, h: Int,
      rgb: Array[Byte], gray: Boolean, tag: String): Unit = {
    val Some((dw, dh, got)) = TiffCodec.decode(bytes)
    assert((dw, dh) == (w, h), tag)
    var i = 0
    while (i < w * h) {
      if (gray) {
        val g = rgb(i * 3) & 0xff
        for (c <- 0 until 3)
          assert((got(i * 3 + c) & 0xff) == g,
            s"$tag gray pixel $i channel $c")
      } else {
        for (c <- 0 until 3)
          assert(got(i * 3 + c) == rgb(i * 3 + c),
            s"$tag pixel $i channel $c")
      }
      i += 1
    }
  }

  private val compressions =
    Seq(None, Some("LZW"), Some("PackBits"), Some("Deflate"), Some("ZLib"))

  test("decodes ImageIO-encoded RGB TIFFs at every supported compression") {
    val (w, h) = (61, 43)
    val rgb = gradient(w, h, 7)
    val img = toBuffered(w, h, rgb, gray = false)
    for (c <- compressions)
      assertDecodes(imageioTiff(img, c), w, h, rgb, gray = false,
        s"rgb/${c.getOrElse("None")}")
  }

  test("decodes ImageIO-encoded grayscale TIFFs at every compression") {
    val (w, h) = (37, 29)
    val g = gradient(w, h, 3).zipWithIndex
      .map { case (v, i) => if (i % 3 == 0) v else 0.toByte }
    // replicate channel 0 so gray assertions line up
    val rgb = g.grouped(3).flatMap(t => Array(t(0), t(0), t(0))).toArray
    val img = toBuffered(w, h, rgb, gray = true)
    for (c <- compressions)
      assertDecodes(imageioTiff(img, c), w, h, rgb, gray = true,
        s"gray/${c.getOrElse("None")}")
  }

  test("high-entropy image through LZW exercises the full code table") {
    // noise defeats LZW matches -> the table fills and resets; any
    // early-change or clear-handling bug surfaces as a wrong pixel
    val (w, h) = (181, 131)
    val rgb = noisy(w, h, 99)
    assertDecodes(imageioTiff(toBuffered(w, h, rgb, gray = false),
      Some("LZW")), w, h, rgb, gray = false, "noise/LZW")
  }

  test("multi-strip layouts assemble in order") {
    val (w, h) = (40, 33)
    val rgb = gradient(w, h, 11)
    val img = toBuffered(w, h, rgb, gray = false)
    for (rps <- Seq(1, 5, 16); c <- Seq(None, Some("LZW")))
      assertDecodes(imageioTiff(img, c, rowsPerStrip = rps), w, h, rgb,
        gray = false, s"strips$rps/${c.getOrElse("None")}")
  }

  test("synth stream reads back identically through ImageIO") {
    val (w, h, seed) = (45, 27, 9)
    val bytes = TiffCodec.synth(w, h, seed)
    val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO rejected the synth TIFF")
    assert((img.getWidth, img.getHeight) == (w, h))
    for (y <- 0 until h; x <- 0 until w) {
      val px = img.getRGB(x, y)
      assert(((px >> 16) & 0xff) == x % 256, s"r($x,$y)")
      assert(((px >> 8) & 0xff) == y % 256, s"g($x,$y)")
      assert((px & 0xff) == (x + y + seed) % 256, s"b($x,$y)")
    }
  }

  test("synth channel sums match the shared closed form") {
    val (w, h, seed) = (23, 17, 6)
    val Some((_, _, rgb)) = PixelCodec.decodePixels(TiffCodec.synth(w, h, seed))
    val (sr, sg, sb) = PixelCodec.channelSums(rgb)
    assert(sr == h.toLong * w * (w - 1) / 2)
    assert(sg == w.toLong * h * (h - 1) / 2)
    assert(sb == sr + sg + w.toLong * h * seed)
  }

  test("header-only dims for both byte orders") {
    val le = TiffCodec.synth(33, 21, 0)
    assert(TiffCodec.dims(le).contains((33, 21)))
    assert(Multimodal.imageDims(le).contains((33, 21)))
    assert(Multimodal.sniff(le) == "image/tiff")
    // ImageIO writes big-endian or little-endian; dims must work on its
    // output too
    val bytes = imageioTiff(toBuffered(9, 7, gradient(9, 7, 0),
      gray = false), None)
    assert(TiffCodec.dims(bytes).contains((9, 7)))
  }

  test("unsupported and malformed inputs return None, never throw") {
    val good = TiffCodec.synth(20, 10, 1)
    assert(TiffCodec.decode(null).isEmpty)
    for (n <- 0 until good.length)
      assert(TiffCodec.decode(good.take(n)).isEmpty, s"truncated at $n")
    val rnd = new scala.util.Random(42)
    for (i <- 1 to 600) {
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      TiffCodec.decode(b) // must not throw
    }
    // 16-bit samples: honestly refused
    val img16 = new BufferedImage(6, 4, BufferedImage.TYPE_USHORT_GRAY)
    assert(TiffCodec.decode(imageioTiff(img16, None)).isEmpty)
  }
}
