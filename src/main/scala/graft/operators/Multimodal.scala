package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (LLM-pipeline surface): image/audio/video
  * as opaque `binary` payloads with typed metadata, batched
  * decode/feature-extract over mapPartitions.
  *
  * The Spark-side plumbing — schema, header sniffing, per-partition
  * batch shape, deterministic output — is real and tested
  * (MultimodalSpec). Pixel decode is REAL for every lossless raster
  * format (PNG/BMP/GIF via [[PixelCodec]] — zlib, raw rows, LZW — and
  * lossless WebP via [[WebpCodec]], conformance-tested against the
  * system libwebp) AND for baseline JPEG ([[JpegCodec]] — Huffman +
  * reference IDCT, ImageIO-cross-checked); audio sample decode is real
  * for PCM WAV and FLAC ([[FlacCodec]]). Only lossy WebP (VP8) and
  * lossy audio (MP3) still use the clearly-marked STUB (`decodeStub`),
  * which derives a deterministic fake feature vector from the payload
  * bytes; a deployment swaps in a real decoder with the same
  * signature.
  */
object Multimodal {

  final case class MediaMeta(doc_id: Long, n_bytes: Long, digest: String,
      sniffed_type: String)

  final case class MediaFeatures(doc_id: Long, sniffed_type: String,
      width: Int, height: Int, features: Array[Float])

  /** Magic-byte content sniffing (X6 MIME resolution — the magic-number
    * core of what the reference delegates to Tika's MimeTypes detector;
    * all signatures are the published public magic numbers). ~40 types:
    * images (jpeg/png/gif/bmp/tiff/webp/avif/heif/ico/psd), audio
    * (mpeg/ogg/flac/wav/aiff/midi/m4a), video (mp4/quicktime/webm/avi),
    * fonts, archives (zip/gzip/bzip2/xz/zstd/7z/rar/tar), data formats
    * (parquet/orc/avro/sqlite), executables (class/wasm/elf),
    * documents (pdf/rtf/xml/html + ISO-media brand dispatch). */
  def sniff(bytes: Array[Byte]): String = {
    def at(i: Int): Int = if (i < bytes.length) bytes(i) & 0xff else -1
    def ascii(from: Int, s: String): Boolean =
      s.indices.forall(i => at(from + i) == s.charAt(i))
    if (at(0) == 0xff && at(1) == 0xd8) "image/jpeg"
    else if (at(0) == 0x89 && ascii(1, "PNG")) "image/png"
    else if (ascii(0, "GIF87a") || ascii(0, "GIF89a")) "image/gif"
    else if (ascii(0, "BM")) "image/bmp"
    else if ((at(0) == 'I' && at(1) == 'I' && at(2) == 0x2a && at(3) == 0) ||
      (at(0) == 'M' && at(1) == 'M' && at(2) == 0 && at(3) == 0x2a))
      "image/tiff"
    else if (ascii(0, "RIFF")) {
      // RIFF container: subtype at offset 8
      if (ascii(8, "WEBP")) "image/webp"
      else if (ascii(8, "AVI ")) "video/x-msvideo"
      else "audio/wav" // WAVE and bare RIFF default
    }
    else if (ascii(0, "ID3") || (at(0) == 0xff && (at(1) & 0xe0) == 0xe0))
      "audio/mpeg"
    else if (ascii(0, "OggS")) "audio/ogg"
    else if (ascii(0, "fLaC")) "audio/flac"
    else if (ascii(0, "FORM") && ascii(8, "AIFF")) "audio/aiff"
    else if (ascii(0, "MThd")) "audio/midi"
    else if (ascii(4, "ftyp")) {
      // ISO base media container: brand at offset 8 picks the type
      if (ascii(8, "avif")) "image/avif"
      else if (ascii(8, "heic") || ascii(8, "heix") || ascii(8, "mif1"))
        "image/heif"
      else if (ascii(8, "qt  ")) "video/quicktime"
      else if (ascii(8, "M4A ")) "audio/mp4"
      else "video/mp4"
    }
    else if (at(0) == 0x1a && at(1) == 0x45 && at(2) == 0xdf && at(3) == 0xa3)
      "video/webm"
    else if (at(0) == 0 && at(1) == 0 && at(2) == 1 && at(3) == 0)
      "image/vnd.microsoft.icon"
    else if (ascii(0, "8BPS")) "image/vnd.adobe.photoshop"
    else if (ascii(0, "wOFF")) "font/woff"
    else if (ascii(0, "wOF2")) "font/woff2"
    else if (ascii(0, "%PDF")) "application/pdf"
    else if (ascii(0, "{\\rtf")) "application/rtf"
    else if (at(0) == 0xd0 && at(1) == 0xcf && at(2) == 0x11 &&
      at(3) == 0xe0) "application/x-ole-storage" // CFB (doc/xls/ppt)
    else if (at(0) == 'P' && at(1) == 'K' && at(2) <= 7) "application/zip"
    else if (at(0) == 0x1f && at(1) == 0x8b) "application/gzip"
    else if (ascii(0, "BZh") && at(3) >= '1' && at(3) <= '9')
      "application/x-bzip2" // level digit required: "BZhello" is text
    else if (at(0) == 0xfd && ascii(1, "7zXZ")) "application/x-xz"
    else if (at(0) == 0x28 && at(1) == 0xb5 && at(2) == 0x2f && at(3) == 0xfd)
      "application/zstd"
    else if (ascii(0, "7z") && at(2) == 0xbc && at(3) == 0xaf)
      "application/x-7z-compressed"
    else if (ascii(0, "Rar!") && at(4) == 0x1a && at(5) == 0x07)
      "application/vnd.rar"
    else if (ascii(257, "ustar")) "application/x-tar"
    else if (at(0) == 0xca && at(1) == 0xfe && at(2) == 0xba && at(3) == 0xbe)
      "application/java-vm"
    else if (at(0) == 0 && ascii(1, "asm")) "application/wasm"
    else if (at(0) == 0x7f && ascii(1, "ELF")) "application/x-executable"
    else if (ascii(0, "SQLite format 3")) "application/vnd.sqlite3"
    else if (ascii(0, "PAR1")) "application/vnd.apache.parquet"
    else if (ascii(0, "ORC") && at(3) >= 0 && at(3) < 0x20)
      "application/x-orc" // next byte non-printable: "ORCHESTRA" is text
    else if (ascii(0, "Obj") && at(3) == 0x01) "application/avro"
    else if (ascii(0, "<?xml")) "application/xml"
    else {
      // leading-whitespace-tolerant html sniff, then ascii-text check
      var i = 0
      while (i < bytes.length && i < 64 && (at(i) == ' ' || at(i) == '\t' ||
        at(i) == '\r' || at(i) == '\n')) i += 1
      val head = new String(bytes.slice(i, math.min(bytes.length, i + 16)),
        java.nio.charset.StandardCharsets.ISO_8859_1).toLowerCase
      if (head.startsWith("<!doctype html") || head.startsWith("<html"))
        "text/html"
      else "application/octet-stream"
    }
  }

  /** [[sniff]] plus ZIP-container refinement: a bare `application/zip`
    * verdict is re-classified by member inventory the way Tika's
    * container-aware detector does it (public container conventions) —
    * OOXML's `[Content_Types].xml` marker with the word/ xl/ ppt/ part
    * roots, ODF and EPUB's self-declaring first `mimetype` entry
    * (stored verbatim per their specs, so its body IS the type), and a
    * jar's `META-INF/MANIFEST.MF`. Anything unrecognized stays
    * `application/zip`. */
  def sniffDeep(bytes: Array[Byte]): String = {
    val base = sniff(bytes)
    if (base == "application/zip") zipContainerType(bytes) else base
  }

  /** Member-inventory classification of a zip payload. Reads entry
    * NAMES only (capped at the first 64 — container markers live at the
    * head) plus the tiny body of a `mimetype` entry if present; never
    * decompresses document content. Malformed archives fall back to
    * `application/zip`. */
  def zipContainerType(bytes: Array[Byte]): String = {
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      var names = List.empty[String]
      var mimetypeBody: Option[String] = None
      var e = zin.getNextEntry
      var n = 0
      while (e != null && n < 64) {
        names ::= e.getName
        if (e.getName == "mimetype" && mimetypeBody.isEmpty) {
          val buf = new java.io.ByteArrayOutputStream(64)
          val chunk = new Array[Byte](64)
          var r = zin.read(chunk)
          while (r > 0 && buf.size < 256) { buf.write(chunk, 0, r); r = zin.read(chunk) }
          // a media type has a slash; anything else is not a declaration
          mimetypeBody = Some(buf.toString("UTF-8").trim)
            .filter(s => s.nonEmpty && s.contains('/'))
        }
        n += 1
        e = zin.getNextEntry
      }
      val ns = names.toSet
      mimetypeBody match {
        case Some(m) => m // ODF / EPUB self-declare
        case None if ns.contains("[Content_Types].xml") =>
          if (names.exists(_.startsWith("word/")))
            "application/vnd.openxmlformats-officedocument" +
              ".wordprocessingml.document"
          else if (names.exists(_.startsWith("xl/")))
            "application/vnd.openxmlformats-officedocument" +
              ".spreadsheetml.sheet"
          else if (names.exists(_.startsWith("ppt/")))
            "application/vnd.openxmlformats-officedocument" +
              ".presentationml.presentation"
          else "application/zip"
        case None if ns.contains("META-INF/MANIFEST.MF") =>
          "application/java-archive"
        case None => "application/zip"
      }
    } catch {
      case scala.util.control.NonFatal(_) => "application/zip"
    } finally zin.close()
  }

  /** REAL header-only VIDEO metadata decode — (timescale_hz,
    * duration_ticks, duration_ms) from the ISO-BMFF movie header: walk
    * the top-level box list to `moov`, then its children to `mvhd`
    * (ISO/IEC 14496-12 §8.2.2); version 0 carries u32
    * timescale/duration, version 1 u64 (u32 timescales in practice).
    * Works on any MP4/M4A/MOV brand the sniffer admits. Returns None
    * for non-ISO-BMFF or truncated payloads. */
  def videoMeta(bytes: Array[Byte]): Option[(Long, Long, Long)] = {
    def at(i: Int): Int =
      if (i >= 0 && i < bytes.length) bytes(i) & 0xff else -1
    def be32(i: Int): Long = ((at(i) << 24) | (at(i + 1) << 16) |
      (at(i + 2) << 8) | at(i + 3)).toLong & 0xffffffffL
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def fourcc(i: Int): String = new String(
      bytes.slice(math.max(0, i), math.max(0, i + 4)),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    if (!(sniff(bytes) match {
      case "video/mp4" | "video/quicktime" | "audio/mp4" | "image/avif" |
        "image/heif" => true
      case _ => false
    })) return None
    // box walk in Long offsets: a hostile 32-bit size field must neither
    // wrap the cursor negative nor throw — malformed input yields None
    def findBox(from: Long, to: Long, name: String): Option[Long] = {
      var o = from
      while (o + 8 <= to) {
        val size = be32(o.toInt)
        if (fourcc(o.toInt + 4) == name) return Some(o)
        val step =
          if (size == 0) return None // last box, extends to EOF — done
          else if (size == 1) be64(o.toInt + 8) // 64-bit largesize
          else size
        if (step < 8) return None // malformed
        o += step
      }
      None
    }
    for {
      moov <- findBox(0, bytes.length.toLong, "moov").map(_.toInt)
      mvhd <- findBox(moov + 8,
        math.min(bytes.length.toLong, moov + be32(moov)), "mvhd")
        .map(_.toInt)
      r <- at(mvhd + 8) match {
        case 0 if mvhd + 28 <= bytes.length =>
          val ts = be32(mvhd + 20)
          val dur = be32(mvhd + 24)
          if (ts > 0) Some((ts, dur, dur * 1000L / ts)) else None
        case 1 if mvhd + 40 <= bytes.length =>
          val ts = be32(mvhd + 28)
          val dur = be64(mvhd + 32)
          if (ts > 0) Some((ts, dur, dur * 1000L / ts)) else None
        case _ => None
      }
    } yield r
  }

  /** Typed metadata pass — pure column expressions, codegen. */
  def meta(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      octet_length(col(payloadCol)).cast("long").as("n_bytes"),
      md5(col(payloadCol)).as("digest"),
      col(payloadCol).as("payload"))

  /** REAL header-only dimension decode — no codec needed, the published
    * container layouts carry width/height in the first bytes:
    *   - PNG: IHDR data at offset 16 (8-byte magic + 4 length + "IHDR"),
    *     width/height big-endian u32 (PNG spec §11.2.2).
    *   - GIF: logical screen descriptor at offset 6, width/height
    *     little-endian u16 (GIF89a spec §18).
    *   - BMP: BITMAPINFOHEADER at offset 18/22, little-endian i32
    *     (height's sign encodes row order — absolute value).
    *   - JPEG: marker scan to the first SOFn (C0–CF minus C4/C8/CC);
    *     height/width big-endian u16 at +5/+7 in the frame header
    *     (ITU T.81 §B.2.2). Standalone markers (01, D0–D9) have no
    *     length field; fill bytes before a marker are skipped.
    * Returns None for non-image or cut-off payloads. */
  def imageDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    def at(i: Int): Int = if (i < bytes.length) bytes(i) & 0xff else -1
    def be32(i: Int): Int = (at(i) << 24) | (at(i + 1) << 16) |
      (at(i + 2) << 8) | at(i + 3)
    def be16(i: Int): Int = (at(i) << 8) | at(i + 1)
    def le16(i: Int): Int = at(i) | (at(i + 1) << 8)
    def le32(i: Int): Int = at(i) | (at(i + 1) << 8) | (at(i + 2) << 16) |
      (at(i + 3) << 24)
    sniff(bytes) match {
      case "image/png" if bytes.length >= 24 =>
        Some((be32(16), be32(20)))
      case "image/gif" if bytes.length >= 10 =>
        Some((le16(6), le16(8)))
      case "image/bmp" if bytes.length >= 26 =>
        Some((le32(18), math.abs(le32(22))))
      case "image/jpeg" =>
        var i = 2
        var res: Option[(Int, Int)] = None
        while (res.isEmpty && i + 3 < bytes.length) {
          if (at(i) != 0xff) i += 1 // fill/garbage byte: resync
          else {
            val marker = at(i + 1)
            if (marker == 0xff) i += 1 // padding FF before marker
            else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9))
              i += 2 // standalone, no length
            else if (marker >= 0xc0 && marker <= 0xcf &&
              marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
              if (i + 8 < bytes.length)
                res = Some((be16(i + 7), be16(i + 5)))
              i = bytes.length // stop either way
            } else i += 2 + be16(i + 2) // skip segment (len incl. itself)
          }
        }
        res
      case "image/webp" if bytes.length >= 16 =>
        // chunk FourCC at 12 picks the WebP flavor (RFC 9649 §2):
        def le24(i: Int): Int = at(i) | (at(i + 1) << 8) | (at(i + 2) << 16)
        val cc = new String(bytes.slice(12, 16),
          java.nio.charset.StandardCharsets.ISO_8859_1)
        cc match {
          case "VP8X" if bytes.length >= 30 =>
            // extended: canvas width/height minus one, 24-bit LE at 24/27
            Some((le24(24) + 1, le24(27) + 1))
          case "VP8 " if bytes.length >= 30 &&
            at(23) == 0x9d && at(24) == 0x01 && at(25) == 0x2a =>
            // lossy: 14-bit LE dims after the 3-byte frame tag + sync code
            Some((le16(26) & 0x3fff, le16(28) & 0x3fff))
          case "VP8L" if bytes.length >= 25 && at(20) == 0x2f =>
            // lossless: 14+14 bit minus-one dims packed after signature
            val v = le32(21)
            Some(((v & 0x3fff) + 1, ((v >> 14) & 0x3fff) + 1))
          case _ => None
        }
      case "image/tiff" => TiffCodec.dims(bytes) // IFD walk, either order
      case "image/vnd.microsoft.icon" => IcoCodec.dims(bytes)
      case "image/avif" | "image/heif" =>
        // ispe (image spatial extents, ISO 23008-12 §6.5.3) boxes carry
        // the dims; a file holds one per item (primary + thumbnails) —
        // report the largest extents (the pragmatic stand-in for the
        // pitm→ipma association walk). Validated by exact box size and
        // version to avoid payload-byte false positives.
        var best: Option[(Int, Int)] = None
        var p = 0
        while (p + 20 <= bytes.length) {
          if (at(p + 4) == 'i' && at(p + 5) == 's' && at(p + 6) == 'p' &&
            at(p + 7) == 'e' && be32(p) == 20 && be32(p + 8) == 0) {
            val w = be32(p + 12)
            val h = be32(p + 16)
            if (w > 0 && h > 0 && w <= 65536 && h <= 65536 &&
              best.forall(b => b._1.toLong * b._2 < w.toLong * h))
              best = Some((w, h))
          }
          p += 1
        }
        best
      case _ => None
    }
  }

  /** REAL header-only AUDIO metadata decode — (sample_rate_hz, channels,
    * detail) where detail is per-container: WAV → sample count in the
    * data chunk, FLAC → total samples from STREAMINFO, MP3 → frame
    * bitrate in kbps. Layouts are the published specs:
    *   - WAV: RIFF/WAVE canonical 44-byte header — fmt chunk carries
    *     channels (LE u16 @22), sample rate (LE u32 @24), block align
    *     (LE u16 @32); data chunk size (LE u32 @40) / block align =
    *     samples.
    *   - FLAC: STREAMINFO (first metadata block, @18 after "fLaC" +
    *     block header + block sizes/frame sizes): 20-bit sample rate,
    *     3-bit channels-1, 5-bit bps-1, 36-bit total samples.
    *   - MP3: optional ID3v2 (syncsafe size @6, frame data at 10+size),
    *     then the 4-byte MPEG-1 Layer III frame header: bitrate index
    *     (b2>>4) and sample-rate index (b2>>2)&3 into the published
    *     tables, channel mode b3>>6 (3 = mono).
    * Returns None for non-audio or cut-off payloads. */
  def audioMeta(bytes: Array[Byte]): Option[(Int, Int, Long)] = {
    def at(i: Int): Int = if (i < bytes.length) bytes(i) & 0xff else -1
    def le16(i: Int): Int = at(i) | (at(i + 1) << 8)
    def le32(i: Int): Long = (at(i) | (at(i + 1) << 8) | (at(i + 2) << 16) |
      (at(i + 3) << 24)).toLong & 0xffffffffL
    def be32(i: Int): Long = ((at(i) << 24) | (at(i + 1) << 16) |
      (at(i + 2) << 8) | at(i + 3)).toLong & 0xffffffffL
    sniff(bytes) match {
      case "audio/wav" if bytes.length >= 36 =>
        // chunk walk from offset 12: real WAVs interleave LIST/fact/cue
        // chunks between fmt and data — fixed offsets would read garbage
        def fourcc(i: Int): String = new String(bytes.slice(i, i + 4),
          java.nio.charset.StandardCharsets.ISO_8859_1)
        var o = 12
        var fmt = -1
        var dataSize = -1L
        while ((fmt < 0 || dataSize < 0) && o + 8 <= bytes.length) {
          val id = fourcc(o)
          val size = le32(o + 4)
          if (id == "fmt ") fmt = o + 8
          else if (id == "data") dataSize = size
          if (size < 0 || size > bytes.length) o = bytes.length // malformed
          else o += 8 + size.toInt + (size.toInt & 1) // chunks word-aligned
        }
        if (fmt >= 0 && dataSize >= 0 && fmt + 16 <= bytes.length) {
          val channels = le16(fmt + 2)
          val sr = le32(fmt + 4).toInt
          val blockAlign = le16(fmt + 12)
          if (channels > 0 && blockAlign > 0)
            Some((sr, channels, dataSize / blockAlign))
          else None
        } else None
      case "audio/flac" if bytes.length >= 26 && (at(4) & 0x7f) == 0 =>
        val sr = (at(18) << 12) | (at(19) << 4) | (at(20) >> 4)
        val channels = ((at(20) >> 1) & 0x7) + 1
        val total = ((at(21) & 0xf).toLong << 32) | be32(22)
        Some((sr, channels, total))
      case "audio/mpeg" =>
        val frameAt =
          if (at(0) == 'I' && at(1) == 'D' && at(2) == '3')
            10 + ((at(6) << 21) | (at(7) << 14) | (at(8) << 7) | at(9))
          else 0
        if (at(frameAt) == 0xff && (at(frameAt + 1) & 0xfe) == 0xfa) {
          // MPEG-1 Layer III only — the table every crawler actually hits
          val bitrates = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
            160, 192, 224, 256, 320)
          val rates = Array(44100, 48000, 32000, 0)
          val br = bitrates(at(frameAt + 2) >> 4)
          val sr = rates((at(frameAt + 2) >> 2) & 3)
          val channels = if ((at(frameAt + 3) >> 6) == 3) 1 else 2
          if (br > 0 && sr > 0) Some((sr, channels, br.toLong)) else None
        } else None
      case _ => None
    }
  }

  /** Decoded PCM waveform statistics — integer-exact, one streaming
    * pass over the sample data (no sample array materialized; executor
    * memory per row is O(1) regardless of clip length). */
  final case class PcmStats(n_samples: Long, sum_abs: Long, sum_sq: Long,
      peak: Int, trough: Int, zero_cross: Long)

  /** REAL audio SAMPLE decode for the codec-free container: 16-bit PCM
    * WAV needs no codec — samples are raw LE int16 in the data chunk,
    * the audio analog of PNG/BMP/GIF on the image side. Computes
    * waveform statistics over the interleaved sample stream (mono
    * fixtures; for multi-channel input the stats are channel-mixed by
    * construction — documented, deterministic). Zero crossings count
    * strict sign flips (prev·cur < 0); zero samples break no run.
    * FLAC joins the sample-exact path through the first-party
    * [[FlacCodec]] ([[flacStats]]); only lossy audio (MP3) stays
    * header-only ([[audioMeta]]). Returns None unless the payload is a
    * well-formed PCM(1) 16-bit WAV with an in-bounds data chunk. */
  def pcmStats(bytes: Array[Byte]): Option[PcmStats] = {
    if (sniff(bytes) != "audio/wav" || bytes.length < 36) return None
    def at(i: Int): Int = if (i < bytes.length) bytes(i) & 0xff else -1
    def le16(i: Int): Int = at(i) | (at(i + 1) << 8)
    def le32(i: Int): Long = (at(i) | (at(i + 1) << 8) | (at(i + 2) << 16) |
      (at(i + 3) << 24)).toLong & 0xffffffffL
    def fourcc(i: Int): String = new String(bytes.slice(i, i + 4),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    var o = 12
    var fmt = -1
    var dataAt = -1; var dataSize = -1L
    while ((fmt < 0 || dataAt < 0) && o + 8 <= bytes.length) {
      val id = fourcc(o)
      val size = le32(o + 4)
      if (id == "fmt ") fmt = o + 8
      else if (id == "data") { dataAt = o + 8; dataSize = size }
      if (size < 0 || size > bytes.length) o = bytes.length // malformed
      else o += 8 + size.toInt + (size.toInt & 1)
    }
    if (fmt < 0 || dataAt < 0 || fmt + 16 > bytes.length) return None
    val codec = le16(fmt)
    val bits = le16(fmt + 14)
    if (codec != 1 || bits != 16) return None // PCM 16-bit only
    if (dataAt.toLong + dataSize > bytes.length || dataSize % 2 != 0)
      return None
    val n = dataSize / 2
    var sumAbs = 0L; var sumSq = 0L; var zc = 0L
    var peak = Int.MinValue; var trough = Int.MaxValue
    var prev = 0
    var i = 0L
    while (i < n) {
      val p = dataAt + (i * 2).toInt
      val s = (le16(p) << 16) >> 16 // sign-extend int16
      sumAbs += math.abs(s); sumSq += s.toLong * s
      if (s > peak) peak = s
      if (s < trough) trough = s
      if (i > 0 && prev.toLong * s < 0) zc += 1
      prev = s
      i += 1
    }
    if (n == 0) { peak = 0; trough = 0 }
    Some(PcmStats(n, sumAbs, sumSq, peak, trough, zc))
  }

  /** [[PcmStats]] over an already-decoded sample array — the exact
    * rules [[pcmStats]] applies to raw WAV data (strict-sign-flip zero
    * crossings, zero peak/trough on empty input). */
  def sampleStats(samples: Array[Int]): PcmStats = {
    var sumAbs = 0L; var sumSq = 0L; var zc = 0L
    var peak = Int.MinValue; var trough = Int.MaxValue
    var prev = 0
    var i = 0
    while (i < samples.length) {
      val s = samples(i)
      sumAbs += math.abs(s.toLong); sumSq += s.toLong * s
      if (s > peak) peak = s
      if (s < trough) trough = s
      if (i > 0 && prev.toLong * s < 0) zc += 1
      prev = s
      i += 1
    }
    if (samples.isEmpty) { peak = 0; trough = 0 }
    PcmStats(samples.length.toLong, sumAbs, sumSq, peak, trough, zc)
  }

  /** REAL compressed-audio sample decode: FLAC through the first-party
    * [[FlacCodec]] (rice-coded prediction residuals — RFC 9639) down
    * to the exact PCM stream, then the same waveform statistics as
    * [[pcmStats]]. Mono channel 0; None for non-FLAC payloads or any
    * bitstream/CRC/MD5 malformation. */
  def flacStats(bytes: Array[Byte]): Option[PcmStats] =
    if (sniff(bytes) != "audio/flac") None
    else FlacCodec.decode(bytes).map(a => sampleStats(a.samples(0)))

  /** Deterministic synthetic image fixtures (header + minimal body) for
    * oracle queries and specs — each is a VALID container prefix whose
    * dims round-trip through [[imageDims]]. */
  object Synth {
    def png(w: Int, h: Int): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(26)
      out.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
        .map(_.toByte))
      out.putInt(13).put("IHDR".getBytes("ASCII"))
      out.putInt(w).putInt(h).put(8.toByte).put(2.toByte)
      out.array()
    }
    def gif(w: Int, h: Int): Array[Byte] =
      "GIF89a".getBytes("ASCII") ++ Array(
        (w & 0xff).toByte, ((w >> 8) & 0xff).toByte,
        (h & 0xff).toByte, ((h >> 8) & 0xff).toByte, 0.toByte)
    def jpeg(w: Int, h: Int): Array[Byte] = {
      // SOI + APP0(JFIF, 16 bytes) + SOF0
      val app0 = Array[Byte](0xff.toByte, 0xe0.toByte, 0, 16) ++
        "JFIF".getBytes("ASCII") ++
        Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
      Array[Byte](0xff.toByte, 0xd8.toByte) ++ app0 ++
        Array[Byte](0xff.toByte, 0xc0.toByte, 0, 17, 8,
          ((h >> 8) & 0xff).toByte, (h & 0xff).toByte,
          ((w >> 8) & 0xff).toByte, (w & 0xff).toByte, 3)
    }
    private def le24(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte)
    private def le32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    private def le16b(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def webp(w: Int, h: Int): Array[Byte] =
      "RIFF".getBytes("ASCII") ++ le32(22) ++ "WEBPVP8X".getBytes("ASCII") ++
        le32(10) ++ Array[Byte](0, 0, 0, 0) ++ le24(w - 1) ++ le24(h - 1)
    def webpLossless(w: Int, h: Int): Array[Byte] = {
      val v = (w - 1) | ((h - 1) << 14)
      "RIFF".getBytes("ASCII") ++ le32(17) ++ "WEBPVP8L".getBytes("ASCII") ++
        le32(5) ++ Array(0x2f.toByte) ++ le32(v.toLong)
    }
    def wav(sampleRate: Int, channels: Int, nSamples: Long): Array[Byte] = {
      val blockAlign = channels * 2 // 16-bit PCM
      val dataSize = nSamples * blockAlign
      "RIFF".getBytes("ASCII") ++ le32(36 + dataSize) ++
        "WAVEfmt ".getBytes("ASCII") ++ le32(16) ++
        le16b(1) ++ le16b(channels) ++ le32(sampleRate.toLong) ++
        le32(sampleRate.toLong * blockAlign) ++ le16b(blockAlign) ++
        le16b(16) ++ "data".getBytes("ASCII") ++ le32(dataSize)
    }

    /** A COMPLETE mono 16-bit PCM WAV (header + real sample data): the
      * deterministic sawtooth s(i) = ((i + seed) mod 200) − 100, so
      * waveform statistics have a form the oracle can recompute
      * directly from (n, seed). */
    def wavPcm(sampleRate: Int, nSamples: Int, seed: Int): Array[Byte] = {
      val header = wav(sampleRate, 1, nSamples.toLong)
      val out = java.util.Arrays.copyOf(header, header.length + nSamples * 2)
      var i = 0
      while (i < nSamples) {
        val s = (i + seed) % 200 - 100
        out(header.length + i * 2) = (s & 0xff).toByte
        out(header.length + i * 2 + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      out
    }
    /** The [[wavPcm]] sawtooth clip, REALLY FLAC-compressed through
      * [[FlacCodec.encode]] (fixed predictors + rice residuals, frame
      * CRCs, stream MD5) — the compressed-audio twin of the synth-side
      * GIF LZW encoder. */
    def flacPcm(sampleRate: Int, nSamples: Int, seed: Int): Array[Byte] = {
      val samples = new Array[Int](nSamples)
      var i = 0
      while (i < nSamples) { samples(i) = (i + seed) % 200 - 100; i += 1 }
      FlacCodec.encode(samples, sampleRate)
    }

    def flac(sampleRate: Int, channels: Int, totalSamples: Long)
        : Array[Byte] = {
      val b20 = (((sampleRate & 0xf) << 4) | ((channels - 1) << 1) |
        ((16 - 1) >> 4)).toByte // low 4 sr bits, channels-1, bps-1 top bit
      val b21 = ((((16 - 1) & 0xf) << 4) |
        ((totalSamples >> 32) & 0xf).toInt).toByte
      "fLaC".getBytes("ASCII") ++
        Array[Byte](0, 0, 0, 34) ++ // STREAMINFO block header, len 34
        Array[Byte](0x10, 0, 0x10, 0, 0, 0, 0, 0, 0, 0) ++ // block/frame sizes
        Array(((sampleRate >> 12) & 0xff).toByte,
          ((sampleRate >> 4) & 0xff).toByte, b20, b21) ++
        Array(((totalSamples >> 24) & 0xff).toByte,
          ((totalSamples >> 16) & 0xff).toByte,
          ((totalSamples >> 8) & 0xff).toByte, (totalSamples & 0xff).toByte)
    }
    def mp3(bitrateIdx: Int, srIdx: Int, mono: Boolean): Array[Byte] =
      "ID3".getBytes("ASCII") ++
        Array[Byte](4, 0, 0, 0, 0, 0, 0) ++ // v2.4, no flags, size 0
        Array(0xff.toByte, 0xfb.toByte, // MPEG-1 Layer III, no CRC
          ((bitrateIdx << 4) | (srIdx << 2)).toByte,
          (if (mono) 0xc0 else 0x00).toByte)
    private def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def mp4(timescale: Long, durationTicks: Long): Array[Byte] = {
      val ftyp = be32(16) ++ "ftypisom".getBytes("ASCII") ++ be32(0)
      val mvhdPayload = Array[Byte](0, 0, 0, 0) ++ // version 0 + flags
        be32(0) ++ be32(0) ++ be32(timescale) ++ be32(durationTicks)
      val mvhd = be32(8L + mvhdPayload.length) ++
        "mvhd".getBytes("ASCII") ++ mvhdPayload
      val moov = be32(8L + mvhd.length) ++ "moov".getBytes("ASCII") ++ mvhd
      ftyp ++ moov
    }
  }

  /** ====== STUB (features only) ======
    * Dimensions are REAL (header parse via [[imageDims]]); the feature
    * vector is a deterministic fake from byte-histogram moments. PNG,
    * BMP, GIF, lossless WebP (VP8L) and baseline JPEG no longer reach
    * this stub — [[PixelCodec]] / [[WebpCodec]] / [[JpegCodec]] decode
    * them for real via [[decodeFeatures]]; what remains is lossy VP8
    * (DCT + loop filter, decoder-rounding-defined). A real deployment
    * replaces the remaining stub formats with an actual decoder (e.g.
    * via JNI/ffmpeg); signature and batch shape stay identical. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    val hist = new Array[Long](8)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) >> 5) += 1; i += 1 }
    val n = math.max(1, bytes.length)
    val feats = hist.map(h => h.toFloat / n)
    val (w, h) = imageDims(bytes).getOrElse((1 + n % 1024, 1 + n % 768))
    (w, h, feats)
  }

  /** Full first-party decode: PNG (zlib + scanline filters), BMP (raw
    * rows), GIF (LZW + palette), lossless WebP (VP8L — Huffman + LZ77
    * + reversible transforms) and baseline JPEG (Huffman + reference
    * IDCT) reconstruct real pixels and real channel statistics
    * ([[PixelCodec]]/[[WebpCodec]]/[[JpegCodec]]); remaining formats
    * (lossy-VP8 WebP, progressive JPEG) fall back to [[decodeStub]].
    * Returns (w, h, feats, decoded-for-real). */
  def decodeFeatures(bytes: Array[Byte]): (Int, Int, Array[Float], Boolean) =
    PixelCodec.decodePixels(bytes) match {
      case Some((w, h, rgb)) =>
        (w, h, PixelCodec.pixelFeatures(w, h, rgb), true)
      case None =>
        val (w, h, feats) = decodeStub(bytes)
        (w, h, feats, false)
    }

  /** Batched feature extraction: one partition = one decode batch
    * (the Scala twin of a pandas-UDF mapInPandas pipeline; partitions
    * bound decoder memory at scale). PNG/BMP rows carry REAL pixel
    * statistics; stub-decoded formats are distinguishable by sniff. */
  def extract(df: DataFrame, idCol: String, payloadCol: String)
      : Dataset[MediaFeatures] = {
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) =>
          val (w, h, feats, _) = decodeFeatures(bytes)
          MediaFeatures(id, sniff(bytes), w, h, feats)
        }
      }
  }

  final case class ResizedMedia(doc_id: Long, src_width: Int,
      src_height: Int, out_width: Int, out_height: Int, payload: Array[Byte])

  /** Aspect-preserving resize: REAL geometry (source dims from the
    * header parse, fit-inside-box output dims by exact integer
    * scaling), and for PNG/BMP inputs a REAL pixel pass — decode via
    * [[PixelCodec]], nearest-neighbor sample, re-encode as a 24-bit
    * BMP (a real, decodable payload) — since r8 GIF joins the real
    * path via its LZW decode, baseline JPEG via [[JpegCodec]] and
    * lossless WebP via [[WebpCodec]]. Formats still lacking a
    * first-party decode (lossy VP8) keep the deterministic stub
    * payload with the same batch shape; rows with no parseable dims
    * are dropped, mirroring a decode-failure filter. */
  def resize(df: DataFrame, idCol: String, payloadCol: String,
      maxW: Int, maxH: Int): Dataset[ResizedMedia] = {
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.flatMap { case (id, bytes) =>
          imageDims(bytes).collect { case (w, h) if w > 0 && h > 0 =>
            // fit inside maxW×maxH, never upscale, floor-exact
            val num = math.min(math.min(maxW.toLong * h, maxH.toLong * w),
              w.toLong * h) // scale numerator: min(maxW/w, maxH/h, 1)·w·h
            // floor-exact, clamped to 1: a 3×1000 into 100×100 must give
            // 1×100, never a degenerate zero dimension
            val ow = math.max(1L, num / h).toInt
            val oh = math.max(1L, num / w).toInt
            val payload = PixelCodec.decodePixels(bytes) match {
              case Some((dw, dh, rgb)) =>
                PixelCodec.encodeBmp(ow, oh,
                  PixelCodec.scaleRgb(rgb, dw, dh, ow, oh))
              case None =>
                java.util.Arrays.copyOf(bytes,
                  math.min(bytes.length, 16)) ++
                  Array((ow & 0xff).toByte, (oh & 0xff).toByte)
            }
            ResizedMedia(id, w, h, ow, oh, payload)
          }
        }
      }
  }

  /** Video frame sampling plumbing: REAL timeline (duration from the
    * mvhd header parse), one output row per sampled timestamp at a
    * fixed interval — the explode is a codegen `sequence`, the frame
    * payload a labeled STUB (no codec in the container; a deployment
    * maps the (doc_id, ts_ms) pairs through a real frame extractor
    * with the same partition-batched shape). */
  def frameSample(df: DataFrame, idCol: String, payloadCol: String,
      intervalMs: Long): DataFrame = {
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    val metaDf = df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.flatMap { case (id, bytes) =>
          videoMeta(bytes).map { case (ts, dur, ms) => (id, ts, dur, ms) }
        }
      }
      .toDF("doc_id", "timescale_hz", "duration_ticks", "duration_ms")
    metaDf.select(col("doc_id"), col("duration_ms"),
        explode(sequence(lit(0L),
          expr(s"duration_ms DIV $intervalMs"))).as("frame_idx"))
      .select(col("doc_id"), col("duration_ms"),
        col("frame_idx").cast("long").as("frame_idx"),
        (col("frame_idx") * intervalMs).cast("long").as("ts_ms"))
  }
}
