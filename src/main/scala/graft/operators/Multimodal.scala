package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (LLM-pipeline surface): image/audio/video
  * as opaque `binary` payloads with typed metadata, batched
  * decode/feature-extract over mapPartitions.
  *
  * The Spark-side plumbing — schema, header sniffing, per-partition
  * batch shape, deterministic output — is real and tested
  * (MultimodalSpec). The actual media decode is a clearly-marked STUB
  * (`decodeStub`): the container ships no image/audio codecs, so it
  * derives a deterministic fake feature vector from the payload bytes; a
  * deployment swaps in a real decoder with the same signature.
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

  /** Typed metadata pass — pure column expressions, codegen. */
  def meta(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      octet_length(col(payloadCol)).cast("long").as("n_bytes"),
      md5(col(payloadCol)).as("digest"),
      col(payloadCol).as("payload"))

  /** ====== STUB ======
    * Deterministic fake decode: 8 "features" from byte histogram moments,
    * plus fake dimensions from the payload length. A real deployment
    * replaces this body with an actual codec call (e.g. via JNI/ffmpeg);
    * signature and batch shape stay identical. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    val hist = new Array[Long](8)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) >> 5) += 1; i += 1 }
    val n = math.max(1, bytes.length)
    val feats = hist.map(h => h.toFloat / n)
    (1 + n % 1024, 1 + n % 768, feats)
  }

  /** Batched feature extraction: one partition = one decode batch
    * (the Scala twin of a pandas-UDF mapInPandas pipeline; partitions
    * bound decoder memory at scale). */
  def extract(df: DataFrame, idCol: String, payloadCol: String)
      : Dataset[MediaFeatures] = {
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) =>
          val (w, h, feats) = decodeStub(bytes)
          MediaFeatures(id, sniff(bytes), w, h, feats)
        }
      }
  }
}
