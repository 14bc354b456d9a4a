package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** First-party FLAC codec (RFC 9639): lossless round-trips must be
  * sample-exact, the encoder must genuinely compress, and the decoder
  * must reject tampered streams (CRC-8 header, CRC-16 frame, stream
  * MD5). The reference delegates audio parsing to an external library
  * (src/plugin/parse-tika); here both halves are first-party so the
  * `flac_stats` oracle can prove decode exactness end-to-end. */
class FlacCodecSpec extends AnyFunSuite {

  private def sawtooth(n: Int, seed: Int): Array[Int] =
    Array.tabulate(n)(i => (i + seed) % 200 - 100)

  private def roundTrip(samples: Array[Int], rate: Int = 16000): Unit = {
    val enc = FlacCodec.encode(samples, rate)
    val dec = FlacCodec.decode(enc).getOrElse(fail("decode returned None"))
    assert(dec.sampleRate == rate)
    assert(dec.channels == 1)
    assert(dec.bps == 16)
    assert(dec.samples(0).toSeq == samples.toSeq)
  }

  test("sawtooth round-trips sample-exactly and compresses ~4x") {
    val s = sawtooth(8000, 37)
    val enc = FlacCodec.encode(s, 16000)
    assert(enc.length < s.length * 2 / 3, // raw PCM would be 16000 bytes
      s"expected real compression, got ${enc.length} bytes for ${s.length * 2} raw")
    roundTrip(s)
  }

  test("single-sample, constant, and tiny clips round-trip") {
    roundTrip(Array(0))
    roundTrip(Array(-32768))
    roundTrip(Array(32767))
    roundTrip(Array.fill(500)(1234)) // constant subframe path
    roundTrip(Array(5, -5))
    roundTrip(Array.tabulate(17)(i => i * 1000 - 8000))
  }

  test("multi-frame clips (>4096 samples) reassemble in order") {
    roundTrip(sawtooth(4096, 0))
    roundTrip(sawtooth(4097, 1))
    roundTrip(sawtooth(10000, 13))
  }

  test("high-entropy input falls back to verbatim and still round-trips") {
    val rnd = new scala.util.Random(42)
    val s = Array.fill(3000)(rnd.nextInt(65536) - 32768)
    roundTrip(s)
  }

  test("random clips round-trip (property)") {
    val gen = for {
      n <- Gen.choose(1, 9000)
      mode <- Gen.oneOf(0, 1, 2)
      seed <- Gen.choose(0, 1 << 20)
    } yield {
      val rnd = new scala.util.Random(seed)
      mode match {
        case 0 => Array.fill(n)(rnd.nextInt(65536) - 32768) // white noise
        case 1 => Array.tabulate(n)(i => // smooth ramp: fixed predictors win
          ((math.sin(i / 50.0) * 12000).toInt + rnd.nextInt(7) - 3)
            .max(-32768).min(32767))
        case 2 => sawtooth(n, seed % 1000)
      }
    }
    (1 to 30).foreach { s =>
      roundTrip(gen(Gen.Parameters.default, Seed(s.toLong))
        .getOrElse(fail("generator failed")))
    }
  }

  test("bit flips in the stream are rejected, never mis-decoded") {
    val enc = FlacCodec.encode(sawtooth(2000, 7), 16000)
    // flip one bit in several positions spread over header/frames
    val positions = Seq(5, 20, 43, enc.length / 2, enc.length - 3)
    for (p <- positions) {
      val bad = enc.clone()
      bad(p) = (bad(p) ^ 0x10).toByte
      FlacCodec.decode(bad) match {
        case None => () // rejected: CRC or structural check caught it
        case Some(a) =>
          // if structurally valid, the MD5 signature must still hold,
          // which means the decode is byte-identical to the original
          assert(a.samples(0).toSeq == sawtooth(2000, 7).toSeq,
            s"bit flip at $p silently mis-decoded")
      }
    }
  }

  test("truncated and non-FLAC payloads decode to None") {
    val enc = FlacCodec.encode(sawtooth(600, 3), 16000)
    assert(FlacCodec.decode(enc.take(30)).isEmpty)
    assert(FlacCodec.decode(enc.take(enc.length - 4)).isEmpty)
    assert(FlacCodec.decode("not a flac stream at all".getBytes).isEmpty)
    assert(FlacCodec.decode(Array.empty[Byte]).isEmpty)
  }

  test("header-only Synth.flac (no frames, total=0) is not sample-decodable") {
    val headerOnly = Multimodal.Synth.flac(16000, 1, 0L)
    // no frames and totalSamples=0: decodes to an empty stream
    val d = FlacCodec.decode(headerOnly)
    assert(d.forall(_.samples(0).isEmpty))
  }

  test("flacStats matches pcmStats on the same waveform") {
    val n = 4500; val seed = 11
    val viaFlac = Multimodal.flacStats(Multimodal.Synth.flacPcm(16000, n, seed))
      .getOrElse(fail("flacStats None"))
    val viaWav = Multimodal.pcmStats(Multimodal.Synth.wavPcm(16000, n, seed))
      .getOrElse(fail("pcmStats None"))
    assert(viaFlac == viaWav)
  }

  /** Minimal MSB-first bit writer for hand-building streams the
    * encoder never emits. */
  private final class TestBits {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0; private var n = 0
    def bit(b: Int): this.type = {
      cur = (cur << 1) | (b & 1); n += 1
      if (n == 8) { out.write(cur); cur = 0; n = 0 }
      this
    }
    def bits(v: Long, w: Int): this.type = {
      var i = w - 1
      while (i >= 0) { bit(((v >>> i) & 1L).toInt); i -= 1 }
      this
    }
    def pad(): this.type = { while (n != 0) bit(0); this }
    def bytes: Array[Byte] = { pad(); out.toByteArray }
  }

  test("decoder-only paths: rice2, escape partitions, LPC, mid/side, wasted bits") {
    // Hand-built stereo stream exercising what the mono encoder never
    // emits: an LPC subframe whose residual uses method=1 (rice2,
    // 5-bit params) with partition order 1 where the second partition
    // is an ESCAPE (raw 4-bit) partition; a constant side channel with
    // one wasted bit; mid/side decorrelation (+1 bps on the side).
    val bs = 8
    val warm = Array(100, 102)
    val coefs = Array(3, -1)
    val shift = 2
    val resid = Array(1, -2, 3, -3, 0, 7) // 2 rice2 + 4 escape-raw
    // independent model of the expected mid channel
    val mid = new Array[Int](bs)
    mid(0) = warm(0); mid(1) = warm(1)
    for (i <- 2 until bs)
      mid(i) = resid(i - 2) +
        (((coefs(0).toLong * mid(i - 1) + coefs(1).toLong * mid(i - 2))
          >> shift)).toInt
    val side = 3 << 1 // constant 3 at effBps, one wasted bit
    val expectedL = mid.map { m => (((m << 1) | (side & 1)) + side) >> 1 }
    val expectedR = mid.map { m => (((m << 1) | (side & 1)) - side) >> 1 }

    val header = new TestBits
    header.bits(0x664c6143L, 32) // "fLaC"
    header.bits(0x80, 8).bits(34, 24) // last block, STREAMINFO, len 34
    header.bits(16, 16).bits(16, 16) // min/max blocksize
    header.bits(0, 24).bits(0, 24) // min/max framesize
    header.bits(8000, 20).bits(1, 3).bits(15, 5) // rate, ch-1=1, bps-1=15
    header.bits(bs.toLong, 36)
    for (_ <- 0 until 16) header.bits(0, 8) // md5 unknown

    val frame = new TestBits
    frame.bits(0x3ffe, 14).bit(0).bit(0) // sync, reserved, fixed blocking
    frame.bits(6, 4).bits(0, 4) // bs code 6 (8-bit follows), sr from SI
    frame.bits(10, 4).bits(4, 3).bit(0) // mid/side, 16-bit, reserved
    frame.bits(0, 8) // frame number 0
    frame.bits(bs - 1, 8)
    val headBytes = frame.bytes
    val f2 = new TestBits
    f2.bits(FlacCodec.crc8(headBytes, 0, headBytes.length).toLong, 8)
    // subframe 0: mid, LPC order 2
    f2.bit(0).bits(0x20 | (coefs.length - 1), 6).bit(0)
    f2.bits(warm(0) & 0xffff, 16).bits(warm(1) & 0xffff, 16)
    f2.bits(5 - 1, 4) // precision 5
    f2.bits(shift, 5)
    for (c <- coefs) f2.bits(c & 0x1f, 5)
    f2.bits(1, 2) // residual method: rice2
    f2.bits(1, 4) // partition order 1 -> two partitions of bs/2=4
    f2.bits(2, 5) // partition 1: rice2 param 2, 4-order=2 residuals
    for (r <- resid.take(2)) {
      val u = (r << 1) ^ (r >> 31)
      for (_ <- 0 until (u >>> 2)) f2.bit(0)
      f2.bit(1).bits(u & 3, 2)
    }
    f2.bits(31, 5).bits(4, 5) // partition 2: ESCAPE, raw 4-bit
    for (r <- resid.drop(2)) f2.bits(r & 0xf, 4)
    // subframe 1: side (bps 17), constant with 1 wasted bit
    f2.bit(0).bits(0, 6).bit(1) // constant, wasted flag
    f2.bit(1) // unary 0 -> wasted = 1, effBps = 16
    f2.bits(3 & 0xffff, 16)
    f2.pad()
    val frameBody = headBytes ++ f2.bytes
    val f3 = new TestBits
    f3.bits(FlacCodec.crc16(frameBody, 0, frameBody.length).toLong, 16)
    val stream = header.bytes ++ frameBody ++ f3.bytes

    val dec = FlacCodec.decode(stream).getOrElse(fail("hand-built stream rejected"))
    assert(dec.channels == 2)
    assert(dec.samples(0).toSeq == expectedL.toSeq, "left channel")
    assert(dec.samples(1).toSeq == expectedR.toSeq, "right channel")
  }
}
