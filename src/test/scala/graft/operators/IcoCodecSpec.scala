package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** ICO decode: entry selection, both payload families (DIB and PNG),
  * header dims, dispatch, and hostile input. */
class IcoCodecSpec extends AnyFunSuite {

  test("picks the largest entry and decodes its PNG payload exactly") {
    val bytes = IcoCodec.synth(16, 48, 7)
    assert(Multimodal.sniff(bytes) == "image/vnd.microsoft.icon")
    val Some((w, h, rgb)) = IcoCodec.decode(bytes)
    assert((w, h) == (48, 48))
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      assert((rgb(o) & 0xff) == x % 256)
      assert((rgb(o + 1) & 0xff) == y % 256)
      assert((rgb(o + 2) & 0xff) == (x + y + 7) % 256)
    }
  }

  test("decodes the 32-bit DIB entry when it is the largest") {
    val bytes = IcoCodec.synth(32, 8, 3) // DIB larger than the PNG
    val Some((w, h, rgb)) = IcoCodec.decode(bytes)
    assert((w, h) == (32, 32))
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      assert((rgb(o) & 0xff) == x % 256, s"($x,$y)")
      assert((rgb(o + 1) & 0xff) == y % 256)
      assert((rgb(o + 2) & 0xff) == (x + y + 3) % 256)
    }
  }

  test("header dims report the largest entry; imageDims routes ICO") {
    val bytes = IcoCodec.synth(16, 48, 1)
    assert(IcoCodec.dims(bytes).contains((48, 48)))
    assert(Multimodal.imageDims(bytes).contains((48, 48)))
  }

  test("decodePixels dispatches ICO payloads") {
    val Some((w, h, _)) = PixelCodec.decodePixels(IcoCodec.synth(16, 24, 2))
    assert((w, h) == (24, 24))
  }

  test("channel sums match the shared gradient closed form") {
    val n = 48
    val Some((_, _, rgb)) = IcoCodec.decode(IcoCodec.synth(16, n, 9))
    val (sr, sg, sb) = PixelCodec.channelSums(rgb)
    assert(sr == n.toLong * n * (n - 1) / 2)
    assert(sg == n.toLong * n * (n - 1) / 2)
    assert(sb == sr + sg + n.toLong * n * 9)
  }

  test("malformed inputs never throw") {
    val good = IcoCodec.synth(16, 32, 5)
    assert(IcoCodec.decode(null).isEmpty)
    for (k <- 0 until good.length)
      IcoCodec.decode(good.take(k)) // no throw
    val rnd = new scala.util.Random(21)
    for (_ <- 1 to 400) {
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      IcoCodec.decode(b) // no throw
    }
  }
}
