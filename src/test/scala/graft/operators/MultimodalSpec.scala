package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

class MultimodalSpec extends AnyFunSuite with SparkSuite {

  private val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte, 0x01, 0x02, 0x03)
  private val png = "PNG0123".getBytes("ISO-8859-1")
  private val wav = "RIFF....WAVE".getBytes("ISO-8859-1")
  private val junk = "hello".getBytes("UTF-8")

  test("magic-byte sniffing") {
    assert(Multimodal.sniff(jpeg) == "image/jpeg")
    assert(Multimodal.sniff(png) == "image/png")
    assert(Multimodal.sniff(wav) == "audio/wav")
    assert(Multimodal.sniff(junk) == "application/octet-stream")
    assert(Multimodal.sniff(Array.empty) == "application/octet-stream")
  }

  test("extended magic table (X6 breadth)") {
    def b(s: String) = s.getBytes("ISO-8859-1")
    assert(Multimodal.sniff(b("GIF89a...")) == "image/gif")
    assert(Multimodal.sniff(b("BM......")) == "image/bmp")
    assert(Multimodal.sniff(Array[Byte]('I', 'I', 0x2a, 0))
      == "image/tiff")
    assert(Multimodal.sniff(b("RIFF....WEBPVP8 ")) == "image/webp")
    assert(Multimodal.sniff(b("RIFF....AVI LIST")) == "video/x-msvideo")
    assert(Multimodal.sniff(b("OggS....")) == "audio/ogg")
    assert(Multimodal.sniff(b("fLaC....")) == "audio/flac")
    assert(Multimodal.sniff(b("....ftypisom")) == "video/mp4")
    assert(Multimodal.sniff(Array[Byte](0x1a, 0x45, 0xdf.toByte, 0xa3.toByte))
      == "video/webm")
    assert(Multimodal.sniff(b("%PDF-1.7")) == "application/pdf")
    assert(Multimodal.sniff(b("PK....")) == "application/zip")
    assert(Multimodal.sniff(Array[Byte](0x1f, 0x8b.toByte, 8))
      == "application/gzip")
    assert(Multimodal.sniff(b("<?xml version=\"1.0\"?>"))
      == "application/xml")
    assert(Multimodal.sniff(b("  \n<!DOCTYPE html><html>"))
      == "text/html")
    assert(Multimodal.sniff(b("<html lang=\"en\">")) == "text/html")
    // mp3 frame-sync header without ID3 tag
    assert(Multimodal.sniff(Array[Byte](0xff.toByte, 0xfb.toByte, 0x90.toByte))
      == "audio/mpeg")
  }

  test("r4 magic table breadth: media brands, archives, data formats") {
    def b(x: String) = x.getBytes("ISO-8859-1")
    // ISO base-media brand dispatch
    assert(Multimodal.sniff(b("....ftypavif....")) == "image/avif")
    assert(Multimodal.sniff(b("....ftypheic....")) == "image/heif")
    assert(Multimodal.sniff(b("....ftypqt  ....")) == "video/quicktime")
    assert(Multimodal.sniff(b("....ftypM4A ....")) == "audio/mp4")
    // audio/fonts/images
    assert(Multimodal.sniff(b("FORM....AIFF")) == "audio/aiff")
    assert(Multimodal.sniff(b("MThd....")) == "audio/midi")
    assert(Multimodal.sniff(Array[Byte](0, 0, 1, 0, 1))
      == "image/vnd.microsoft.icon")
    assert(Multimodal.sniff(b("8BPS....")) == "image/vnd.adobe.photoshop")
    assert(Multimodal.sniff(b("wOFF....")) == "font/woff")
    assert(Multimodal.sniff(b("wOF2....")) == "font/woff2")
    // archives
    assert(Multimodal.sniff(b("BZh9....")) == "application/x-bzip2")
    assert(Multimodal.sniff(Array[Byte](0xfd.toByte, '7', 'z', 'X', 'Z', 0))
      == "application/x-xz")
    assert(Multimodal.sniff(Array[Byte](0x28, 0xb5.toByte, 0x2f, 0xfd.toByte))
      == "application/zstd")
    assert(Multimodal.sniff(Array[Byte]('7', 'z', 0xbc.toByte, 0xaf.toByte))
      == "application/x-7z-compressed")
    assert(Multimodal.sniff(b("Rar!") ++ Array[Byte](0x1a, 0x07))
      == "application/vnd.rar")
    assert(Multimodal.sniff(
      new Array[Byte](257) ++ b("ustar")) == "application/x-tar")
    // executables + data formats
    assert(Multimodal.sniff(Array[Byte](0xca.toByte, 0xfe.toByte,
      0xba.toByte, 0xbe.toByte)) == "application/java-vm")
    assert(Multimodal.sniff(Array[Byte](0, 'a', 's', 'm', 1))
      == "application/wasm")
    assert(Multimodal.sniff(Array[Byte](0x7f) ++ b("ELF"))
      == "application/x-executable")
    assert(Multimodal.sniff(b("SQLite format 3 "))
      == "application/vnd.sqlite3")
    assert(Multimodal.sniff(b("PAR1....")) == "application/vnd.apache.parquet")
    assert(Multimodal.sniff(b("ORC") ++ Array[Byte](1))
      == "application/x-orc")
    // short ASCII prefixes must not steal ordinary text
    assert(Multimodal.sniff(b("ORCHESTRA rehearsal"))
      == "application/octet-stream")
    assert(Multimodal.sniff(b("BZhello world"))
      == "application/octet-stream")
    assert(Multimodal.sniff(b("Obj") ++ Array[Byte](0x01))
      == "application/avro")
    assert(Multimodal.sniff(b("{\\rtf1\\ansi")) == "application/rtf")
  }

  test("real header-only dimension decode: PNG/GIF/BMP/JPEG") {
    // synthesized fixtures round-trip their planted dims
    assert(Multimodal.imageDims(Multimodal.Synth.png(640, 480))
      .contains((640, 480)))
    assert(Multimodal.imageDims(Multimodal.Synth.gif(320, 200))
      .contains((320, 200)))
    assert(Multimodal.imageDims(Multimodal.Synth.jpeg(1920, 1080))
      .contains((1920, 1080)))
    // JPEG with a padding FF and a restart marker before SOF
    val weird = Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xff.toByte, // padding FF
      0xff.toByte, 0x01) ++ // standalone TEM marker
      Multimodal.Synth.jpeg(12, 34).drop(2)
    assert(Multimodal.imageDims(weird).contains((12, 34)))
    // BMP: 26+ byte BITMAPINFOHEADER prefix, negative height (top-down)
    val bmp = java.nio.ByteBuffer.allocate(30)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bmp.put('B'.toByte).put('M'.toByte).putInt(30).putInt(0).putInt(54)
    bmp.putInt(40).putInt(800).putInt(-600)
    assert(Multimodal.imageDims(bmp.array()).contains((800, 600)))
    // AVIF/HEIF: ispe boxes inside meta/iprp/ipco carry the extents;
    // the largest wins over a thumbnail's
    def ispe(w: Int, h: Int): Array[Byte] = java.nio.ByteBuffer
      .allocate(20).putInt(20).put("ispe".getBytes("ASCII"))
      .putInt(0).putInt(w).putInt(h).array()
    def box(name: String, body: Array[Byte]): Array[Byte] =
      java.nio.ByteBuffer.allocate(8 + body.length).putInt(8 + body.length)
        .put(name.getBytes("ASCII")).put(body).array()
    val avif = box("ftyp", "avif".getBytes("ASCII") ++ new Array[Byte](8)) ++
      box("meta", new Array[Byte](4) ++
        box("iprp", box("ipco", ispe(1200, 800) ++ ispe(160, 90))))
    assert(Multimodal.sniff(avif) == "image/avif")
    assert(Multimodal.imageDims(avif).contains((1200, 800)))
    // non-images and cut-off headers: None
    assert(Multimodal.imageDims(junk).isEmpty)
    assert(Multimodal.imageDims(Multimodal.Synth.png(1, 1).take(20)).isEmpty)
    assert(Multimodal.imageDims(jpeg).isEmpty) // SOI but no SOF
  }

  test("metadata + batched feature extraction plumbing") {
    import spark.implicits._
    val df = Seq((1L, jpeg), (2L, png), (3L, junk))
      .toDF("doc_id", "payload")
    val meta = Multimodal.meta(df, "doc_id", "payload").collect()
    assert(meta.length == 3)
    val m1 = meta.find(_.getLong(0) == 1L).get
    assert(m1.getLong(1) == jpeg.length)
    assert(m1.getString(2).length == 32) // md5 hex

    val feats = Multimodal.extract(df, "doc_id", "payload")
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).sniffed_type == "image/jpeg")
    assert(feats(3L).sniffed_type == "application/octet-stream")
    assert(feats.values.forall(_.features.length == 8))
    // deterministic: histogram fractions sum to ~1
    assert(math.abs(feats(3L).features.sum - 1.0f) < 1e-6)
    // stub dimensions derive from payload size — stable across runs
    val again = Multimodal.extract(df, "doc_id", "payload")
      .collect().map(f => f.doc_id -> f).toMap
    assert(again(1L).width == feats(1L).width)
  }

  test("WebP dims: VP8X canvas, VP8L packed, VP8 lossy sync-coded") {
    assert(Multimodal.imageDims(Multimodal.Synth.webp(1920, 1080))
      .contains((1920, 1080)))
    assert(Multimodal.imageDims(Multimodal.Synth.webpLossless(333, 77))
      .contains((333, 77)))
    // max 24-bit canvas round-trips
    assert(Multimodal.imageDims(Multimodal.Synth.webp(16383, 16383))
      .contains((16383, 16383)))
    // hand-built VP8 lossy frame header (sync code 9d 01 2a, 14-bit LE dims)
    val vp8 = "RIFF".getBytes("ISO-8859-1") ++
      Array[Byte](30, 0, 0, 0) ++ "WEBPVP8 ".getBytes("ISO-8859-1") ++
      Array[Byte](10, 0, 0, 0) ++ Array[Byte](0, 0, 0) ++
      Array(0x9d.toByte, 0x01.toByte, 0x2a.toByte) ++
      Array[Byte]((640 & 0xff).toByte, (640 >> 8).toByte,
        (480 & 0xff).toByte, (480 >> 8).toByte)
    assert(Multimodal.imageDims(vp8).contains((640, 480)))
    // truncated VP8X: None, not garbage
    assert(Multimodal.imageDims(Multimodal.Synth.webp(10, 10).take(28)).isEmpty)
  }

  test("audio header metadata: WAV fmt, FLAC STREAMINFO, MP3 frame header") {
    assert(Multimodal.audioMeta(Multimodal.Synth.wav(44100, 2, 88200L))
      .contains((44100, 2, 88200L)))
    assert(Multimodal.audioMeta(Multimodal.Synth.wav(8000, 1, 12345L))
      .contains((8000, 1, 12345L)))
    // FLAC: 36-bit total samples survives (> 2^32)
    assert(Multimodal.audioMeta(
      Multimodal.Synth.flac(96000, 8, 8589934593L)) // 2^33 + 1
      .contains((96000, 8, 8589934593L)))
    // MP3: idx 9 = 128 kbps, sr idx 0 = 44100, stereo
    assert(Multimodal.audioMeta(Multimodal.Synth.mp3(9, 0, mono = false))
      .contains((44100, 2, 128L)))
    assert(Multimodal.audioMeta(Multimodal.Synth.mp3(14, 2, mono = true))
      .contains((32000, 1, 320L)))
    // free-format bitrate (idx 0) is unparseable: None
    assert(Multimodal.audioMeta(Multimodal.Synth.mp3(0, 0, mono = false)).isEmpty)
    // non-audio: None
    assert(Multimodal.audioMeta(junk).isEmpty)
    assert(Multimodal.audioMeta(Multimodal.Synth.png(5, 5)).isEmpty)
    // non-canonical WAV: a LIST chunk between fmt and data still parses
    // (the chunk walk, not fixed offsets)
    val canonical = Multimodal.Synth.wav(22050, 2, 441L)
    val withList = canonical.take(36) ++
      "LIST".getBytes("ISO-8859-1") ++ Array[Byte](4, 0, 0, 0) ++
      "INFO".getBytes("ISO-8859-1") ++ canonical.drop(36)
    assert(Multimodal.audioMeta(withList).contains((22050, 2, 441L)))
    // malformed chunk size: None, no infinite walk
    val bad = canonical.take(36) ++
      "LIST".getBytes("ISO-8859-1") ++
      Array(0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte)
    assert(Multimodal.audioMeta(bad).isEmpty)
  }

  test("video metadata: mvhd box walk, duration in ticks and ms") {
    // timescale 600, 3000 ticks = 5000 ms
    assert(Multimodal.videoMeta(Multimodal.Synth.mp4(600L, 3000L))
      .contains((600L, 3000L, 5000L)))
    // ms rounding floors: 599 ticks at 600 Hz = 998 ms
    assert(Multimodal.videoMeta(Multimodal.Synth.mp4(600L, 599L))
      .contains((600L, 599L, 998L)))
    // truncated before mvhd payload: None, not garbage
    assert(Multimodal.videoMeta(Multimodal.Synth.mp4(600L, 3000L).take(30))
      .isEmpty)
    // non-ISO-BMFF: None
    assert(Multimodal.videoMeta(junk).isEmpty)
    assert(Multimodal.videoMeta(Multimodal.Synth.wav(8000, 1, 10L)).isEmpty)
    // hostile box sizes: top-bit-set (would wrap an Int cursor negative)
    // and near-Int.MaxValue — None, never a thrown index error
    val good = Multimodal.Synth.mp4(600L, 3000L)
    for (sz <- Seq(0x80000004L, 0x7fffffffL, 9L)) {
      val evil = good.clone()
      // rewrite the ftyp box size field (offset 0, big-endian u32)
      evil(0) = ((sz >> 24) & 0xff).toByte
      evil(1) = ((sz >> 16) & 0xff).toByte
      evil(2) = ((sz >> 8) & 0xff).toByte
      evil(3) = (sz & 0xff).toByte
      assert(Multimodal.videoMeta(evil).isEmpty, s"size $sz")
    }
    // size==1 largesize walk: ftyp re-encoded as a 64-bit-size box still
    // reaches moov (header grows by 8, so pad the largesize to match)
    val ftyp64 = Array[Byte](0, 0, 0, 1) ++ "ftyp".getBytes("ISO-8859-1") ++
      Array[Byte](0, 0, 0, 0, 0, 0, 0, 24) ++ // largesize = 24
      "isom".getBytes("ISO-8859-1") ++ Array[Byte](0, 0, 0, 0)
    val mp4b = ftyp64 ++ good.drop(16) // original moov follows
    assert(Multimodal.videoMeta(mp4b).contains((600L, 3000L, 5000L)))
  }

  test("frameSample explodes one row per interval tick from the real header") {
    import spark.implicits._
    val df = Seq(
      (1L, Multimodal.Synth.mp4(600L, 3000L)),  // 5000 ms → idx 0..5
      (2L, Multimodal.Synth.mp4(1000L, 1500L)), // 1500 ms → idx 0..1
      (3L, "nonsense".getBytes("UTF-8")))       // unparseable → dropped
      .toDF("doc_id", "payload")
    val rows = Multimodal.frameSample(df, "doc_id", "payload", 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(rows.count(_._1 == 1L) == 6)
    assert(rows.count(_._1 == 2L) == 2)
    assert(!rows.exists(_._1 == 3L))
    assert(rows.filter(_._1 == 2L).map(_._3).sorted.toSeq == Seq(0L, 1000L))
  }

  test("resize keeps aspect ratio, never upscales, drops undecodable rows") {
    import spark.implicits._
    val df = Seq(
      (1L, Multimodal.Synth.png(1000, 500)), // 2:1 → fits 100x50
      (2L, Multimodal.Synth.gif(50, 20)),    // smaller than box: unchanged
      (3L, junk))                            // no dims → dropped
      .toDF("doc_id", "payload")
    val out = Multimodal.resize(df, "doc_id", "payload", 100, 100)
      .collect().map(r => r.doc_id -> r).toMap
    assert(out(1L).out_width == 100 && out(1L).out_height == 50)
    assert(out(2L).out_width == 50 && out(2L).out_height == 20)
    assert(!out.contains(3L))
    assert(out(1L).src_width == 1000 && out(1L).src_height == 500)
  }

  test("zip container refinement edge cases") {
    import graft.ops.ZipParse.build
    val b = "x".getBytes("UTF-8")
    // non-zip input passes sniffDeep through untouched
    assert(Multimodal.sniffDeep(png) == "image/png")
    // truncated/garbage after the PK magic degrades to plain zip
    val corrupt = Array[Byte]('P', 'K', 3, 4) ++
      "garbage-not-a-zip".getBytes("ISO-8859-1")
    assert(Multimodal.sniffDeep(corrupt) == "application/zip")
    // a mimetype entry whose body is not a media type (no slash) is
    // ignored; the manifest still classifies the archive
    val junkMime = build(Seq("mimetype" -> "notamime".getBytes("UTF-8"),
      "META-INF/MANIFEST.MF" -> b))
    assert(Multimodal.zipContainerType(junkMime) == "application/java-archive")
    // OOXML marker without a recognized part root stays plain zip
    val bareOoxml = build(Seq("[Content_Types].xml" -> b, "other/part" -> b))
    assert(Multimodal.zipContainerType(bareOoxml) == "application/zip")
    // self-declaration wins over the manifest (ODF jars exist)
    val odfJar = build(Seq(
      "mimetype" ->
        "application/vnd.oasis.opendocument.spreadsheet".getBytes("UTF-8"),
      "META-INF/MANIFEST.MF" -> b))
    assert(Multimodal.zipContainerType(odfJar) ==
      "application/vnd.oasis.opendocument.spreadsheet")
  }

  test("Paeth predictor matches the spec definition") {
    // spec §9.4: nearest of left/up/upper-left to p = a+b-c, ties
    // breaking left, then up
    assert(PixelCodec.paeth(0, 0, 0) == 0)
    assert(PixelCodec.paeth(10, 20, 15) == 15) // p=15: pc=0 smallest -> c
    assert(PixelCodec.paeth(1, 200, 100) == 100) // p=101: pc=1 smallest -> c
    assert(PixelCodec.paeth(10, 10, 0) == 10) // p=20: pa=pb=10 tie -> left
    assert(PixelCodec.paeth(100, 50, 10) == 100) // p=140: pa=40 pb=90 pc=130
    assert(PixelCodec.paeth(50, 100, 10) == 100) // symmetric: up wins
  }

  test("PNG round trip reconstructs exact pixels through all 5 filters") {
    // synthPng cycles filter types y % 5; any unfilter bug breaks sums
    val bytes = PixelCodec.synthPng(23, 17, 31)
    val Some((w, h, rgb)) = PixelCodec.decodePng(bytes)
    assert((w, h) == (23, 17) && rgb.length == 23 * 17 * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val p = (y * w + x) * 3
      assert((rgb(p) & 0xff) == x && (rgb(p + 1) & 0xff) == y &&
        (rgb(p + 2) & 0xff) == (x + y + 31),
        s"pixel ($x,$y) filter ${y % 5}")
    }
    // header-only dims path agrees with the full decode
    assert(Multimodal.imageDims(bytes).contains((23, 17)))
  }

  // minimal PNG builder for layouts synthPng doesn't emit: unfiltered
  // scanlines handed to the ONE shared chunk/deflate assembler
  private def rawPng(w: Int, h: Int, colorType: Int, channels: Int,
      pix: Array[Byte], interlace: Int = 0): Array[Byte] = {
    val stride = w * channels
    val raw = new Array[Byte](h * (1 + stride))
    for (y <- 0 until h)
      System.arraycopy(pix, y * stride, raw, y * (1 + stride) + 1, stride)
    PixelCodec.assemblePng(w, h, colorType, interlace, raw)
  }

  test("PNG gray and RGBA layouts normalize to RGB; exotic ones refuse") {
    val gray = rawPng(2, 2, 0, 1, Array[Byte](10, 20, 30, 40))
    assert(PixelCodec.decodePng(gray).map(_._3.toSeq).contains(
      Seq[Byte](10, 10, 10, 20, 20, 20, 30, 30, 30, 40, 40, 40)))
    val rgba = rawPng(1, 2, 6, 4,
      Array[Byte](1, 2, 3, -1, 4, 5, 6, -128))
    assert(PixelCodec.decodePng(rgba).map(_._3.toSeq).contains(
      Seq[Byte](1, 2, 3, 4, 5, 6)))
    // Adam7 interlace: honestly refused, not mis-decoded
    assert(PixelCodec.decodePng(
      rawPng(2, 2, 2, 3, new Array[Byte](12), interlace = 1)).isEmpty)
    // truncated zlib stream
    val full = PixelCodec.synthPng(16, 16, 0)
    assert(PixelCodec.decodePng(full.take(full.length - 20)).isEmpty)
    // header-only prefix (the old Synth.png fixture): dims parse but
    // pixel decode must refuse rather than fabricate
    assert(PixelCodec.decodePng(Multimodal.Synth.png(5, 5)).isEmpty)
  }

  test("hostile containers refuse (None) instead of throwing") {
    // PNG chunk length near Int.MaxValue must fail the bounds check,
    // not wrap negative and index out of bounds
    val evil = PixelCodec.synthPng(4, 4, 0)
    val bb = java.nio.ByteBuffer.wrap(evil)
    bb.putInt(8, 0x7ffffff0) // IHDR declared length
    assert(PixelCodec.decodePng(evil).isEmpty)
    val evil2 = PixelCodec.synthPng(4, 4, 0)
    // corrupt the IDAT length field (chunk 2 at offset 8+25)
    java.nio.ByteBuffer.wrap(evil2).putInt(33, 0x7ffffff0)
    assert(PixelCodec.decodePng(evil2).isEmpty)

    // BMP negative data offset / Int.MinValue height
    val bmp = PixelCodec.synthBmp(4, 4, 0)
    val b1 = bmp.clone()
    java.nio.ByteBuffer.wrap(b1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(10, 0x80000000)
    assert(PixelCodec.decodeBmp(b1).isEmpty)
    val b2 = bmp.clone()
    java.nio.ByteBuffer.wrap(b2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(22, Int.MinValue)
    assert(PixelCodec.decodeBmp(b2).isEmpty)
  }

  test("BMP bottom-up rows, BGR order, and 4-byte padding decode") {
    val bytes = PixelCodec.synthBmp(5, 4, 7) // rowSize 16 > 15: padded
    val Some((w, h, rgb)) = PixelCodec.decodeBmp(bytes)
    assert((w, h) == (5, 4))
    for (y <- 0 until h; x <- 0 until w) {
      val p = (y * w + x) * 3
      assert((rgb(p) & 0xff) == x && (rgb(p + 1) & 0xff) == y &&
        (rgb(p + 2) & 0xff) == (x + y + 7), s"pixel ($x,$y)")
    }
    assert(PixelCodec.decodeBmp(bytes.take(53)).isEmpty)
  }

  test("resize performs a REAL pixel pass on decodable inputs") {
    import spark.implicits._
    // 20x10 gradient PNG fit into 10x10 -> 10x5 real BMP
    val src = PixelCodec.synthPng(20, 10, 0)
    val out = Multimodal.resize(
      Seq((1L, src)).toDF("doc_id", "payload"), "doc_id", "payload",
      10, 10).collect().head
    assert((out.out_width, out.out_height) == (10, 5))
    val Some((w, h, rgb)) = PixelCodec.decodeBmp(out.payload)
    assert((w, h) == (10, 5))
    // nearest neighbor: out pixel (x,y) samples src (2x, 2y) ->
    // r = 2x, g = 2y, b = 2x+2y
    for (y <- 0 until 5; x <- 0 until 10) {
      val p = (y * 10 + x) * 3
      assert((rgb(p) & 0xff) == 2 * x && (rgb(p + 1) & 0xff) == 2 * y &&
        (rgb(p + 2) & 0xff) == 2 * x + 2 * y, s"($x,$y)")
    }
    // undecodable input (header-only JPEG) keeps the stub payload shape
    val stub = Multimodal.resize(
      Seq((2L, Multimodal.Synth.jpeg(40, 20))).toDF("doc_id", "payload"),
      "doc_id", "payload", 10, 10).collect().head
    assert((stub.out_width, stub.out_height) == (10, 5))
    assert(Multimodal.sniff(stub.payload) == "image/jpeg") // prefix copy
  }

  test("decodeFeatures: real stats for PNG/BMP/GIF, stub for lossy") {
    val (w, h, feats, real) =
      Multimodal.decodeFeatures(PixelCodec.synthPng(10, 10, 0))
    assert(real && (w, h) == (10, 10))
    // mean R over gradient x=0..9 is 4.5; aspect 1.0
    assert(math.abs(feats(0) - 4.5f) < 1e-5 && feats(7) == 1.0f)
    val (_, _, _, bmpReal) =
      Multimodal.decodeFeatures(PixelCodec.synthBmp(4, 4, 0))
    assert(bmpReal)
    val (_, _, _, gifReal) =
      Multimodal.decodeFeatures(PixelCodec.synthGif(9, 7, 3))
    assert(gifReal, "GIF LZW decodes for real since r8")
    val (_, _, _, jpegHeaderOnly) =
      Multimodal.decodeFeatures(Multimodal.Synth.jpeg(10, 10))
    assert(!jpegHeaderOnly,
      "a header-only JPEG prefix has no scan data: falls to the stub")
    val (_, _, _, jpegReal) =
      Multimodal.decodeFeatures(JpegCodec.synthDcOnlyGray(2, 2, 16, _ => 7))
    assert(jpegReal, "well-formed baseline JPEG decodes for real since r8")
  }

  test("GIF round trip reconstructs exact pixels through real LZW") {
    val bytes = PixelCodec.synthGif(23, 17, 31)
    val Some((w, h, rgb)) = PixelCodec.decodeGif(bytes)
    assert((w, h) == (23, 17) && rgb.length == 23 * 17 * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val p = (y * w + x) * 3
      val v = x + y + 31 // gray ramp palette: all three channels = v
      assert((rgb(p) & 0xff) == v && (rgb(p + 1) & 0xff) == v &&
        (rgb(p + 2) & 0xff) == v, s"pixel ($x,$y)")
    }
    // dispatch + header-dims agreement
    assert(PixelCodec.decodePixels(bytes).isDefined)
    assert(Multimodal.imageDims(bytes).contains((23, 17)))
    assert(Multimodal.sniff(bytes) == "image/gif")
  }

  test("GIF LZW survives adversarial streams: KwKwK, width growth, " +
      "table-full clear") {
    def roundTrip(idx: Array[Byte], minCode: Int): Unit = {
      val enc = PixelCodec.gifLzwEncode(idx, minCode)
      val dec = PixelCodec.gifLzwDecode(enc, minCode, idx.length)
      assert(dec.isDefined, s"decode failed: n=${idx.length} min=$minCode")
      assert(java.util.Arrays.equals(dec.get, idx),
        s"mismatch: n=${idx.length} min=$minCode")
    }
    // all-same-symbol: maximal KwKwK chains (code == next every step)
    roundTrip(Array.fill(5000)(0.toByte), 2)
    roundTrip(Array.fill(5000)(7.toByte), 8)
    // random 256-symbol stream long enough to cross 9→10→11→12 bit
    // widths AND hit the table-full clear (≥3837 dictionary misses)
    val rnd = new scala.util.Random(42)
    roundTrip(Array.fill(60000)((rnd.nextInt(256)).toByte), 8)
    // 4-symbol alphabet at the minimum code size
    roundTrip(Array.fill(20000)((rnd.nextInt(4)).toByte), 2)
    // highly repetitive with bursts: long dictionary hits then misses
    val bursty = Array.tabulate(30000) { i =>
      (if ((i / 500) % 2 == 0) i % 3 else rnd.nextInt(256)).toByte
    }
    roundTrip(bursty, 8)
    // single pixel and tiny images
    roundTrip(Array[Byte](5), 8)
    roundTrip(Array[Byte](1, 1), 2)
  }

  test("GIF interlace: stored pass order maps back to display rows") {
    // h=10 pass rows: 0,8 | 4 | 2,6 | 1,3,5,7,9
    assert((0 until 10).map(PixelCodec.deinterlaceRow(_, 10)) ==
      Seq(0, 8, 4, 2, 6, 1, 3, 5, 7, 9))
    // interlaced GIF through the SAME container writer as synthGif:
    // rows stored in pass order, each display row y filled with value
    // y; decode must un-shuffle
    val w = 4; val h = 10
    val stored = new Array[Byte](w * h)
    for (i <- 0 until h; x <- 0 until w)
      stored(i * w + x) = PixelCodec.deinterlaceRow(i, h).toByte
    val bytes = PixelCodec.assembleGif(w, h, stored, interlace = true)
    val Some((dw, dh, rgb)) = PixelCodec.decodeGif(bytes)
    assert((dw, dh) == (w, h))
    for (y <- 0 until h; x <- 0 until w)
      assert((rgb((y * w + x) * 3) & 0xff) == y, s"row $y x $x")
  }

  test("GIF partial frame (offset or sub-screen) refuses honestly") {
    // a frame smaller than the logical screen, or at an offset, would
    // decode pixels inconsistent with the header dims — must be None
    val good = PixelCodec.synthGif(8, 8, 0)
    def patched(f: Array[Byte] => Unit): Array[Byte] = {
      val b = good.clone(); f(b); b
    }
    val desc = 13 + 768 // image descriptor offset (no extensions)
    assert((good(desc) & 0xff) == 0x2c)
    // frame 4x8 at origin: narrower than the 8x8 screen
    assert(PixelCodec.decodeGif(patched(_(desc + 5) = 4)).isEmpty)
    // full-size frame but at left offset 1
    assert(PixelCodec.decodeGif(patched(_(desc + 1) = 1)).isEmpty)
    // top offset 2
    assert(PixelCodec.decodeGif(patched(_(desc + 3) = 2)).isEmpty)
  }

  test("PCM WAV sample decode: exact waveform stats, refusals honest") {
    val n = 523; val seed = 37
    val bytes = Multimodal.Synth.wavPcm(16000, n, seed)
    val Some(st) = Multimodal.pcmStats(bytes)
    // independent recompute of the sawtooth
    val samples = (0 until n).map(i => (i + seed) % 200 - 100)
    assert(st.n_samples == n)
    assert(st.sum_abs == samples.map(math.abs).sum)
    assert(st.sum_sq == samples.map(s => s.toLong * s).sum)
    assert(st.peak == samples.max && st.trough == samples.min)
    assert(st.zero_cross == samples.sliding(2).count(p =>
      p.head.toLong * p(1) < 0))
    // header-only fixture declares data it doesn't carry: refuse
    assert(Multimodal.pcmStats(Multimodal.Synth.wav(8000, 1, 100L)).isEmpty)
    // truncated sample stream
    assert(Multimodal.pcmStats(bytes.take(bytes.length - 11)).isEmpty)
    // non-16-bit PCM: flip the bits-per-sample field (offset 34)
    val b8 = bytes.clone(); b8(34) = 8
    assert(Multimodal.pcmStats(b8).isEmpty)
    // non-PCM codec id (offset 20)
    val alaw = bytes.clone(); alaw(20) = 6
    assert(Multimodal.pcmStats(alaw).isEmpty)
    // negative samples survive sign extension: seed forcing min -100
    val Some(st2) = Multimodal.pcmStats(Multimodal.Synth.wavPcm(8000, 200, 0))
    assert(st2.trough == -100 && st2.peak == 99)
  }

  test("hostile GIFs refuse (None) instead of throwing") {
    val good = PixelCodec.synthGif(8, 8, 0)
    // truncated mid-LZW-data
    assert(PixelCodec.decodeGif(good.take(good.length - 10)).isEmpty)
    // truncated inside the palette
    assert(PixelCodec.decodeGif(good.take(20)).isEmpty)
    // header-only fixture (Synth.gif): no image data at all
    assert(PixelCodec.decodeGif(Multimodal.Synth.gif(5, 5)).isEmpty)
    // extension block that never terminates
    val ext = good.take(13 + 768).toArray ++
      Array[Byte](0x21, 0xf9.toByte, 4) ++ Array.fill(200)(1.toByte)
    assert(PixelCodec.decodeGif(ext).isEmpty)
    // trailer before any image descriptor
    assert(PixelCodec.decodeGif(
      good.take(13 + 768).toArray :+ 0x3b.toByte).isEmpty)
  }
}
