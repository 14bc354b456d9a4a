package graft.ops

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.schemas.ContentRow

/** S11 — MIME-filtered raw dump with the two-level md5 layout
  * (FileDumper.java:105-260). */
class FileDumperSpec extends AnyFunSuite with SparkSuite {

  private def contents = {
    import spark.implicits._
    Seq(
      ContentRow("http://a.com/p", "b", "<html><body>x</body></html>"
        .getBytes("UTF-8"), "text/html", Map.empty),
      ContentRow("http://a.com/j", "b",
        Array[Byte](0xff.toByte, 0xd8.toByte, 1, 2), "image/jpeg", Map.empty),
      ContentRow("http://a.com/t", "b", "plain words here".getBytes("UTF-8"),
        "text/plain; charset=utf-8", Map.empty)).toDS()
  }

  test("mime filter + two-level layout + sniff-over-declared") {
    val out = Files.createTempDirectory("dump").toString
    val manifest = FileDumper.dump(contents, out, Set("image/jpeg"))
      .collect()
    assert(manifest.length == 1)
    val e = manifest.head
    assert(e.mime == "image/jpeg" && e.path.endsWith(".jpg"))
    val h = FileDumper.md5Hex("http://a.com/j")
    assert(e.path == s"${h.take(2)}/${h.substring(2, 4)}/$h.jpg")
    val written = Files.readAllBytes(Paths.get(out, e.path))
    assert(written.length == 4 && (written(0) & 0xff) == 0xff)
  }

  test("no filter dumps everything; declared type backs up the sniff") {
    val out = Files.createTempDirectory("dump-all").toString
    val manifest = FileDumper.dump(contents, out).collect()
      .map(e => e.url -> e).toMap
    assert(manifest.size == 3)
    // html is sniffed from magic (leading <html)
    assert(manifest("http://a.com/p").mime == "text/html")
    // plain text has no magic → declared content-type, params stripped
    assert(manifest("http://a.com/t").mime == "text/plain")
    assert(manifest("http://a.com/t").path.endsWith(".txt"))
    assert(manifest.values.forall(e =>
      Files.exists(Paths.get(out, e.path))))
  }
}
