package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Unified seeded fuzz over every first-party decoder: hostile web
  * content is the operating reality for a crawler, so NO byte-level
  * decode path may throw — each must return None (or a valid decode
  * that happens to survive the mutation). Each codec already has
  * targeted hostile-input tests; this harness adds systematic breadth:
  * every truncation point and thousands of deterministic random
  * single-byte / flipped-bit / region-scramble mutations per format,
  * fed to EVERY decoder (not just the matching one — a BMP-mutated-
  * into-a-RIFF-signature must not crash the WebP path either).
  */
class CodecFuzzSpec extends AnyFunSuite {

  // every byte-level decode entry point in the library; None/valueless
  // returns are fine, exceptions are the failure
  private val decoders: Seq[(String, Array[Byte] => Any)] = Seq(
    "sniff" -> (Multimodal.sniff(_)),
    "sniffDeep" -> (Multimodal.sniffDeep(_)),
    "zipContainerType" -> (Multimodal.zipContainerType(_)),
    "imageDims" -> (Multimodal.imageDims(_)),
    "audioMeta" -> (Multimodal.audioMeta(_)),
    "videoMeta" -> (Multimodal.videoMeta(_)),
    "pcmStats" -> (Multimodal.pcmStats(_)),
    "flacStats" -> (Multimodal.flacStats(_)),
    "decodePixels" -> (PixelCodec.decodePixels(_)),
    "webpArgb" -> (WebpCodec.decodeArgb(_)),
    "tiff" -> (TiffCodec.decode(_)),
    "ico" -> (IcoCodec.decode(_)),
    "pdf" -> (graft.ops.PdfParse.extract(_)),
    "rtf" -> (graft.ops.Rtf.parse(_)),
    "worddoc" -> (graft.ops.WordDoc.extract(_)),
    "odf" -> (graft.ops.OfficeDocs.extractOdf(_)),
    "xlsx" -> (graft.ops.OfficeDocs.extractXlsx(_)),
    "docx" -> (graft.ops.OfficeDocs.extractDocx(_)),
    "epub" -> (graft.ops.OfficeDocs.extractEpub(_)),
    "xlsbiff" -> (graft.ops.XlsDoc.extract(_)),
    "ppt" -> (graft.ops.PptDoc.extract(_)),
    "decodeFeatures" -> (Multimodal.decodeFeatures(_)))

  private val seeds: Seq[(String, Array[Byte])] = Seq(
    "png" -> PixelCodec.synthPng(13, 9, 5),
    "bmp" -> PixelCodec.synthBmp(13, 9, 5),
    "gif" -> PixelCodec.synthGif(13, 9, 5),
    "jpeg" -> JpegCodec.synthDcOnlyGray(3, 2, 16, b => b * 7 - 30, 2),
    "webp" -> WebpCodec.synth(13, 9, 5),
    "wav" -> Multimodal.Synth.wavPcm(16000, 300, 7),
    "flac" -> Multimodal.Synth.flacPcm(16000, 300, 7),
    "mp4" -> Multimodal.Synth.mp4(600, 4200),
    "tiff" -> TiffCodec.synth(13, 9, 5),
    "ico" -> IcoCodec.synth(8, 24, 5),
    "pdf" -> graft.ops.PdfParse.build(Seq(Seq("fuzz page"))),
    "pdfenc" -> graft.ops.PdfParse.build(Seq(Seq("fuzz page")),
      encrypt = true),
    "rtf" -> "{\\rtf1\\ansi fuzz body\\par}".getBytes("windows-1252"),
    "doc" -> graft.ops.WordDoc.synth("fuzz one\r", "fuzz two"),
    "xls" -> graft.ops.XlsDoc.synth("S", Seq("fuzz cell"), 1.5, 3, 450, "i"),
    "ppt" -> graft.ops.PptDoc.synth(Seq("fuzz slide", "second line")))

  private def check(tag: String, bytes: Array[Byte]): Unit =
    for ((dn, fn) <- decoders)
      try fn(bytes)
      catch {
        case e: Throwable =>
          fail(s"$dn threw on $tag (${bytes.length} bytes): $e")
      }

  test("every truncation of every synth payload decodes without throwing") {
    for ((name, full) <- seeds; n <- 0 to full.length)
      check(s"$name truncated at $n", java.util.Arrays.copyOf(full, n))
  }

  test("deterministic random mutations never throw (bit flips, byte sets, swaps)") {
    val rnd = new scala.util.Random(0x5eed)
    for ((name, full) <- seeds; i <- 1 to 400) {
      val b = full.clone()
      rnd.nextInt(3) match {
        case 0 => // single random byte set
          b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
        case 1 => // flip one bit
          val p = rnd.nextInt(b.length)
          b(p) = (b(p) ^ (1 << rnd.nextInt(8))).toByte
        case _ => // scramble a small region
          val p = rnd.nextInt(b.length)
          val len = math.min(1 + rnd.nextInt(16), b.length - p)
          for (k <- 0 until len) b(p + k) = rnd.nextInt(256).toByte
      }
      check(s"$name mutation $i", b)
    }
  }

  test("digit-run inflation never throws (the r8 PdfParse bug class)") {
    // single-byte mutations cannot turn "7 0 obj" into a >Int.MaxValue
    // numeral — which is exactly how the r8 unguarded-.toInt bugs in
    // PdfParse//Length//V//R and xlsx <v> escaped the fuzzer. This
    // mutation class finds every ASCII digit run in a payload and
    // replaces it with a 10-25 digit run (overflowing Int and Long),
    // so any text-ish parser doing .toInt/.toLong on scanned numerals
    // is exercised on overflow in every numeric field it has.
    val rnd = new scala.util.Random(0xd161f)
    val digitRun = "[0-9]+".r
    for ((name, full) <- seeds) {
      val s = new String(full.map(b => (b & 0xff).toChar))
      val runs = digitRun.findAllMatchIn(s).map(m => (m.start, m.end))
        .toSeq.take(40)
      for (((st, en), i) <- runs.zipWithIndex) {
        val big = Array.fill(10 + rnd.nextInt(16))(
          ('0' + rnd.nextInt(10)).toByte)
        big(0) = ('1' + rnd.nextInt(9)).toByte // no leading zero
        val b = full.take(st) ++ big ++ full.drop(en)
        check(s"$name digit-run $i inflated", b)
      }
    }
  }

  test("cross-format header grafts never throw") {
    // splice each format's first 16 bytes onto each other's body — the
    // sniff-then-decode path must survive lying magic numbers
    for ((n1, a) <- seeds; (n2, c) <- seeds if n1 != n2) {
      val head = a.take(math.min(16, a.length))
      check(s"$n1-head on $n2-body", head ++ c.drop(math.min(16, c.length)))
    }
  }

  test("pathological sizes: empty, single byte, huge-dims headers") {
    check("empty", Array.emptyByteArray)
    for (v <- 0 until 256) check(s"single $v", Array(v.toByte))
    // headers that declare enormous dimensions must refuse, not allocate
    check("png 16k x 16k", Multimodal.Synth.png(16383, 16383))
    check("gif 65k x 65k", Multimodal.Synth.gif(65535, 65535))
    check("webp huge", Multimodal.Synth.webpLossless(16384, 16384))
  }
}
