package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.schemas.ParseStatusCodes

class ZipParseSpec extends AnyFunSuite {

  private def b(s: String) = s.getBytes("UTF-8")

  test("member walk: html parsed, txt decoded, no-extension + dirs skipped") {
    val zip = ZipParse.build(Seq(
      "page.html" -> b("<html><body>Hello <a href=\"http://e.com/x\">X</a></body></html>"),
      "dir/" -> Array.empty[Byte],
      "dir/notes.txt" -> b("note text"),
      "README" -> b("skipped")))
    val r = ZipParse.parse("http://h.example.com/a.zip", zip)
    assert(r.status == ParseStatusCodes.Success)
    assert(r.nMembers == 2)
    assert(r.text == "page.html Hello X dir/notes.txt note text")
    assert(r.outlinks.map(_.toUrl) == Seq("http://e.com/x"))
  }

  test("nested zip expands up to maxDepth, deeper stays unexpanded") {
    val level2 = ZipParse.build(Seq("deep.txt" -> b("deep")))
    val level1 = ZipParse.build(Seq("mid.txt" -> b("mid"),
      "level2.zip" -> level2))
    val zip = ZipParse.build(Seq("top.txt" -> b("top"),
      "level1.zip" -> level1))
    val r1 = ZipParse.parse("http://h/a.zip", zip, maxDepth = 1)
    assert(r1.text == "top.txt top level1.zip mid.txt mid")
    val r2 = ZipParse.parse("http://h/a.zip", zip, maxDepth = 2)
    assert(r2.text == "top.txt top level1.zip mid.txt mid level2.zip deep.txt deep")
  }

  test("declared-length mismatch fails as truncated (ZipParser.java:72-78)") {
    val zip = ZipParse.build(Seq("a.txt" -> b("x")))
    val r = ZipParse.parse("http://h/a.zip", zip,
      declaredLength = Some(zip.length + 1L))
    assert(r.status == ParseStatusCodes.Failed && r.nMembers == 0)
    val ok = ZipParse.parse("http://h/a.zip", zip,
      declaredLength = Some(zip.length.toLong))
    assert(ok.status == ParseStatusCodes.Success)
  }

  test("member cap bounds the walk (zip-bomb guard)") {
    val zip = ZipParse.build((1 to 10).map(i => s"f$i.txt" -> b(s"t$i")))
    val r = ZipParse.parse("http://h/a.zip", zip, maxMembers = 3)
    assert(r.nMembers == 3)
  }

  test("garbage bytes are not a zip: empty success (no members), not a crash") {
    val r = ZipParse.parse("http://h/a.zip", b("this is not a zip"))
    assert(r.nMembers == 0 && r.text.isEmpty)
  }

  test("rich members route through the gate: pdf, rtf, docx, doc inside a zip") {
    val pdf = PdfParse.build(Seq(Seq("pdf member text")))
    val rtf = "{\\rtf1\\ansi rtf member text\\par}".getBytes("windows-1252")
    val docx = ZipParse.build(Seq(
      "word/document.xml" ->
        b("<w:document><w:body><w:p><w:r><w:t>docx member text</w:t>" +
          "</w:r></w:p></w:body></w:document>")))
    val doc = WordDoc.synth("doc member text\r", "part two")
    val zip = ZipParse.build(Seq(
      "a.pdf" -> pdf, "b.rtf" -> rtf, "c.docx" -> docx, "d.doc" -> doc))
    val r = ZipParse.parse("http://h.example.com/rich.zip", zip)
    assert(r.status == ParseStatusCodes.Success)
    assert(r.nMembers == 4, r.nMembers)
    for (expect <- Seq("pdf member text", "rtf member text",
        "docx member text", "doc member text"))
      assert(r.text.contains(expect), s"missing '$expect' in: ${r.text}")
  }
}
