package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

class ArcSourceSpec extends AnyFunSuite with SparkSuite {

  private val blob = ArcSource.write(Seq(
    ("filedesc://test.arc", "0.0.0.0", "20240101000000", "text/plain",
      "1 0 InternetArchive".getBytes),
    ("http://a.example.com/", "10.0.0.1", "20240102030405", "text/html",
      "<html>A</html>".getBytes),
    ("http://b.example.com/x", "10.0.0.2", "20240102030406", "text/plain",
      "hello".getBytes)))

  test("round-trip: member scan, inflate, header parse") {
    val recs = ArcSource.records(blob)
    assert(recs.length == 2) // filedesc version record dropped
    val a = recs.find(_.url == "http://a.example.com/").get
    assert(a.ip == "10.0.0.1")
    assert(a.contentType == "text/html")
    assert(new String(a.body, "UTF-8") == "<html>A</html>")
    assert(a.declaredLength == 14)
    // 2024-01-02T03:04:05Z
    assert(a.timestamp == 1704164645000L)
  }

  test("garbage between members is skipped") {
    val noisy = "JUNKJUNK".getBytes ++ blob ++ "tail".getBytes
    assert(ArcSource.records(noisy).length == 2)
  }

  test("distributed read via binaryFiles") {
    val dir = Files.createTempDirectory("arc").toString
    Files.write(java.nio.file.Paths.get(dir, "part1.arc"), blob)
    val ds = ArcSource.read(spark, dir)
    assert(ds.count() == 2)
    assert(ds.collect().map(_.url).toSet ==
      Set("http://a.example.com/", "http://b.example.com/x"))
  }
}
