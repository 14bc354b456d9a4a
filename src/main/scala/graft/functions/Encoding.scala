package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}
import java.util.regex.Pattern

import org.apache.spark.unsafe.types.UTF8String

/** X5 — charset detection and best-effort decompression
  * (EncodingDetector.java clue chain, GZIPUtils.java:55-100 /
  * DeflateUtils.java best-effort unzip).
  *
  * Clue precedence (EncodingDetector.guessEncoding:219-260: highest-
  * confidence clue wins, header/meta clues outrank the statistical
  * detector, sniffed bytes are the fallback):
  *   BOM > Content-Type charset parameter > HTML `<meta charset>` /
  *   http-equiv > XML declaration > valid-UTF-8 check > windows-1252.
  *
  * Everything here is a pure JVM scalar, exposed to plans as codegen'd
  * `StaticInvoke` calls (no UDF ser/de) — see `decodeCol`. */
object Encoding {

  private val MaxSniff = 8192

  // ---- decompression (GZIPUtils.unzipBestEffort semantics) ----

  def isGzip(b: Array[Byte]): Boolean =
    b != null && b.length > 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  /** Best-effort gunzip: truncated/corrupt input yields the bytes
    * recovered so far; null only when nothing could be read. */
  def unzipBestEffort(in: Array[Byte], sizeLimit: Int = Int.MaxValue): Array[Byte] = {
    if (in == null) return null
    val out = new ByteArrayOutputStream(math.min(in.length * 5, 1 << 20))
    try {
      val gz = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(in))
      val buf = new Array[Byte](4096)
      var n = gz.read(buf)
      while (n > 0 && out.size < sizeLimit) {
        out.write(buf, 0, math.min(n, sizeLimit - out.size))
        n = gz.read(buf)
      }
    } catch { case _: Exception => /* best effort: keep what we have */ }
    if (out.size == 0) null else out.toByteArray
  }

  /** Best-effort inflate, trying zlib-wrapped then raw deflate
    * (DeflateUtils.inflateBestEffort). */
  def inflateBestEffort(in: Array[Byte], sizeLimit: Int = Int.MaxValue): Array[Byte] = {
    if (in == null) return null
    def tryInflate(raw: Boolean): Array[Byte] = {
      val inf = new java.util.zip.Inflater(raw)
      inf.setInput(in)
      val out = new ByteArrayOutputStream(math.min(in.length * 5, 1 << 20))
      val buf = new Array[Byte](4096)
      try {
        var n = inf.inflate(buf)
        while (n > 0 && out.size < sizeLimit) {
          out.write(buf, 0, math.min(n, sizeLimit - out.size))
          n = inf.inflate(buf)
        }
      } catch { case _: Exception => }
      finally inf.end()
      if (out.size == 0) null else out.toByteArray
    }
    val zlib = tryInflate(raw = false)
    if (zlib != null) zlib else tryInflate(raw = true)
  }

  // ---- charset detection ----

  private val metaCharsetRe = Pattern.compile(
    "(?i)<meta[^>]+charset\\s*=\\s*[\"']?\\s*([A-Za-z0-9_+:.\\-]+)")
  private val xmlDeclRe = Pattern.compile(
    "(?i)<\\?xml[^>]*encoding\\s*=\\s*[\"']([A-Za-z0-9_+:.\\-]+)[\"']")
  private val ctCharsetRe = Pattern.compile(
    "(?i)charset\\s*=\\s*[\"']?\\s*([A-Za-z0-9_+:.\\-]+)")

  /** EncodingDetector.resolveEncodingAlias: canonical charset or null. */
  def resolveAlias(name: String): Charset =
    try {
      if (name == null) null
      else Charset.forName(name.trim)
    } catch { case _: Exception => null }

  /** Valid-UTF-8 check over the sniff window (the statistical detector's
    * cheap core: UTF-8 is self-synchronizing, so a window that decodes
    * cleanly is near-certainly UTF-8). */
  private[functions] def looksUtf8(b: Array[Byte], limit: Int): Boolean = {
    var i = 0
    val n = math.min(b.length, limit)
    while (i < n) {
      val c = b(i) & 0xff
      val len =
        if (c < 0x80) 1
        else if ((c & 0xe0) == 0xc0) 2
        else if ((c & 0xf0) == 0xe0) 3
        else if ((c & 0xf8) == 0xf0) 4
        else return false
      if (i + len > n) return true // sequence truncated at window/data edge
      var j = 1
      while (j < len) {
        if ((b(i + j) & 0xc0) != 0x80) return false
        j += 1
      }
      i += len
    }
    true
  }

  /** (charset, bomLength) from a byte-order mark, or (null, 0). */
  def bom(b: Array[Byte]): (Charset, Int) = {
    if (b == null || b.length < 2) return (null, 0)
    val b0 = b(0) & 0xff; val b1 = b(1) & 0xff
    if (b.length >= 3 && b0 == 0xef && b1 == 0xbb && (b(2) & 0xff) == 0xbf)
      (StandardCharsets.UTF_8, 3)
    else if (b0 == 0xfe && b1 == 0xff) (StandardCharsets.UTF_16BE, 2)
    else if (b0 == 0xff && b1 == 0xfe) (StandardCharsets.UTF_16LE, 2)
    else (null, 0)
  }

  /** Detect the charset of `bytes` given the Content-Type header clue.
    * Returns (charset, bytes-to-skip). */
  def detect(bytes: Array[Byte], contentType: String): (Charset, Int) = {
    val (bomCs, bomLen) = bom(bytes)
    if (bomCs != null) return (bomCs, bomLen)
    // header clue
    if (contentType != null) {
      val m = ctCharsetRe.matcher(contentType)
      if (m.find()) {
        val cs = resolveAlias(m.group(1))
        if (cs != null) return (cs, 0)
      }
    }
    // meta / xml-decl clues from the sniff window (ASCII-compatible scan)
    if (bytes != null && bytes.nonEmpty) {
      val window = new String(bytes, 0, math.min(bytes.length, MaxSniff),
        StandardCharsets.ISO_8859_1)
      val mm = metaCharsetRe.matcher(window)
      if (mm.find()) {
        val cs = resolveAlias(mm.group(1))
        if (cs != null) return (cs, 0)
      }
      val xm = xmlDeclRe.matcher(window)
      if (xm.find()) {
        val cs = resolveAlias(xm.group(1))
        if (cs != null) return (cs, 0)
      }
      if (looksUtf8(bytes, MaxSniff)) return (StandardCharsets.UTF_8, 0)
      // EncodingDetector's last resort for the Latin web
      return (Charset.forName("windows-1252"), 0)
    }
    (StandardCharsets.UTF_8, 0)
  }

  /** Full pipeline: gunzip/inflate when the magic says so, detect the
    * charset, decode with replacement (never throws). */
  def decode(bytes0: Array[Byte], contentType: String): String = {
    if (bytes0 == null) return null
    val bytes =
      if (isGzip(bytes0)) {
        val u = unzipBestEffort(bytes0); if (u == null) bytes0 else u
      } else bytes0
    if (bytes.isEmpty) return ""
    val (cs, skip) = detect(bytes, contentType)
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    dec.decode(java.nio.ByteBuffer.wrap(bytes, skip, bytes.length - skip))
      .toString
  }

  // ---- Column wrappers (codegen'd StaticInvoke, no UDF ser/de) ----

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
  import org.apache.spark.sql.graftbridge.ColumnBridge
  import org.apache.spark.sql.types.{BinaryType, BooleanType, StringType}

  /** decompress-if-compressed + detect + decode, as a plan column.
    * propagateNull=false: a NULL contentType must not null the result —
    * decodeU falls back to BOM/meta/UTF-8 detection when it is absent. */
  def decodeCol(bytes: Column, contentType: Column): Column =
    ColumnBridge.column(StaticInvoke(
      Class.forName("graft.functions.Encoding"), StringType, "decodeU",
      Seq(ColumnBridge.expression(bytes), ColumnBridge.expression(contentType)),
      Seq(BinaryType, StringType), propagateNull = false))

  /** fixture encoder for oracle queries (arbitrary charset + gzip).
    * propagateNull=false: encodeU defaults a NULL charset to UTF-8. */
  def encodeCol(text: Column, charset: Column, gzip: Column): Column =
    ColumnBridge.column(StaticInvoke(
      Class.forName("graft.functions.Encoding"), BinaryType, "encodeU",
      Seq(ColumnBridge.expression(text), ColumnBridge.expression(charset),
        ColumnBridge.expression(gzip)),
      Seq(StringType, StringType, BooleanType), propagateNull = false))

  // ---- UTF8String/byte[] entry points for StaticInvoke codegen ----

  def decodeU(bytes: Array[Byte], contentType: UTF8String): UTF8String = {
    val s = decode(bytes, if (contentType == null) null else contentType.toString)
    if (s == null) null else UTF8String.fromString(s)
  }

  /** Test-fixture encoder (charsets beyond Spark's `encode` list, plus
    * optional gzip) — lets oracle queries synthesize non-UTF-8 payloads
    * inside the plan. */
  def encodeU(text: UTF8String, charset: UTF8String, gzip: Boolean): Array[Byte] = {
    if (text == null) return null
    val cs = resolveAlias(if (charset == null) "UTF-8" else charset.toString)
    val raw = text.toString.getBytes(if (cs == null) StandardCharsets.UTF_8 else cs)
    if (!gzip) raw
    else {
      val bo = new ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bo)
      gz.write(raw); gz.close()
      bo.toByteArray
    }
  }
}
