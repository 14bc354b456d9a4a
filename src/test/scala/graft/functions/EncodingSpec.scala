package graft.functions

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

/** Table-driven charset-detection + decompression tests
  * (EncodingDetector clue chain, GZIPUtils/DeflateUtils best-effort). */
class EncodingSpec extends AnyFunSuite {

  private def gzip(b: Array[Byte]): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bo)
    gz.write(b); gz.close(); bo.toByteArray
  }

  test("BOM clues win") {
    val utf8 = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
      "héllo".getBytes(StandardCharsets.UTF_8)
    assert(Encoding.decode(utf8, "text/html") == "héllo") // BOM stripped
    val utf16le = Array[Byte](0xff.toByte, 0xfe.toByte) ++
      "hi".getBytes(StandardCharsets.UTF_16LE)
    assert(Encoding.decode(utf16le, null) == "hi")
  }

  test("Content-Type charset parameter outranks the byte heuristic") {
    val latin = "café münchen".getBytes(StandardCharsets.ISO_8859_1)
    assert(Encoding.decode(latin, "text/html; charset=ISO-8859-1") ==
      "café münchen")
  }

  test("HTML meta charset clue") {
    val html = """<html><meta charset="windows-1252"><body>soirée 10€</body>"""
    val bytes = html.getBytes(java.nio.charset.Charset.forName("windows-1252"))
    assert(Encoding.decode(bytes, "text/html") == html)
  }

  test("XML declaration clue") {
    val xml = """<?xml version="1.0" encoding="ISO-8859-1"?><r>à</r>"""
    val bytes = xml.getBytes(StandardCharsets.ISO_8859_1)
    assert(Encoding.decode(bytes, "") == xml)
  }

  test("valid UTF-8 detected without any clue") {
    val s = "日本語 and ascii"
    assert(Encoding.decode(s.getBytes(StandardCharsets.UTF_8), "") == s)
  }

  test("invalid UTF-8 falls back to windows-1252") {
    val s = "café münchen" // 0xE9/0xFC are invalid UTF-8 lead/continuation
    assert(Encoding.decode(s.getBytes(StandardCharsets.ISO_8859_1), "") == s)
  }

  test("gzip payloads are unzipped before detection") {
    val s = "<html><body>compressed naïve text</body></html>"
    assert(Encoding.decode(gzip(s.getBytes(StandardCharsets.UTF_8)),
      "text/html") == s)
  }

  test("truncated gzip is recovered best-effort") {
    val s = "x" * 10000
    val g = gzip(s.getBytes(StandardCharsets.UTF_8))
    val truncated = g.take(g.length - 6) // chop the trailer + some data
    val out = Encoding.unzipBestEffort(truncated)
    assert(out != null && out.length > 0)
    assert(new String(out, StandardCharsets.UTF_8).forall(_ == 'x'))
  }

  test("deflate best-effort handles zlib and raw streams") {
    val raw = "deflated content".getBytes(StandardCharsets.UTF_8)
    def deflate(nowrap: Boolean) = {
      val d = new java.util.zip.Deflater(-1, nowrap)
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](1024)
      val n = d.deflate(buf); d.end(); buf.take(n)
    }
    assert(Encoding.inflateBestEffort(deflate(false)).sameElements(raw))
    assert(Encoding.inflateBestEffort(deflate(true)).sameElements(raw))
  }

  test("unknown charset alias is ignored, garbage never throws") {
    val junk = Array.tabulate[Byte](64)(i => (i * 37 + 128).toByte)
    assert(Encoding.decode(junk, "text/html; charset=klingon-8") != null)
    assert(Encoding.resolveAlias("no-such-charset") == null)
    assert(Encoding.decode(Array.empty[Byte], null) == "")
    assert(Encoding.decode(null, null) == null)
  }
}
