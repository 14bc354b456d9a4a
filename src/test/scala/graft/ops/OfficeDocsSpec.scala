package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** RTF + office-container extraction against the reference's OWN
  * parse-tika samples and test expectations (TestRTFParser,
  * TestOOParser, TestXlsxParser). */
class OfficeDocsSpec extends AnyFunSuite {

  private val sampleDir = "/root/reference/src/plugin/parse-tika/sample"

  private def sample(name: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(sampleDir, name))

  private def norm(s: String): String = s.replaceAll("[ \t\r\n]+", " ").trim

  test("RTF: the reference's TestRTFParser expectations, all three") {
    val r = Rtf.parse(sample("test.rtf"))
    assert(r.ok)
    assert(r.text.contains("The quick brown fox jumps over the lazy dog"),
      r.text.take(300))
    assert(r.title == "test rft document")
    assert(r.subject == "tests")
  }

  test("RTF: escapes, unicode with uc fallback, skip destinations, info") {
    val rtf = ("{\\rtf1\\ansi{\\fonttbl{\\f0 Arial;}}" +
      "{\\info{\\title My T\\'e9tle}{\\author someone}}" +
      "\\uc1 A\\u233 e B \\'41 \\{x\\} {\\*\\unknowndest hidden} C\\par D}")
      .getBytes("windows-1252")
    val r = Rtf.parse(rtf)
    assert(r.ok)
    assert(r.title == "My Tétle")
    assert(r.author == "someone")
    assert(!r.text.contains("Arial")) // fonttbl skipped
    assert(!r.text.contains("hidden")) // {\*\dest} skipped
    assert(r.text.contains("A" + "é")) // \u233 with fallback 'e' skipped
    assert(r.text.contains("A B") || r.text.contains("Aé B"))
    assert(r.text.contains("{x}"))
    assert(r.text.contains("C\nD")) // \par breaks
  }

  test("ODT and SXW: the reference's ootest expected sentences") {
    for (f <- Seq("ootest.odt", "ootest.sxw")) {
      val Some(text) = OfficeDocs.extractOdf(sample(f))
      val n = norm(text)
      assert(n.contains("Lorem ipsum dolor sit amet, consectetuer " +
        "adipiscing elit"), f)
      assert(n.contains("Ąćęłń") /* Ąćęłń… */, f)
      assert(n.contains("http://www.openoffice.org"), f)
      // table cells from the expected file all surface
      for (tok <- Seq("Col1", "Col2", "Col3", "Cell1", "Cel3", "TOTAL"))
        assert(n.contains(tok), s"$f missing $tok")
    }
  }

  test("xlsx: the reference's TestXlsxParser expectation, verbatim") {
    val Some(text) = OfficeDocs.extractXlsx(sample("test.xlsx"))
    assert(norm(text) == "test.txt This is a test for spreadsheets xlsx")
  }

  test("docx: the reference's TestEmbeddedDocuments expectation — " +
      "text found three archive levels down") {
    val Some(text) = OfficeDocs.extractDocx(
      sample("test_recursive_embedded.docx"))
    assert(text.contains("embed_0")) // the document body itself
    // the expected sentence lives in embed3.txt, inside embed3.zip,
    // inside embed2.zip, inside embed1.zip, inside an Ole10Native
    // package in word/embeddings — the full recursive walk
    assert(text.contains("When in the Course of human events"),
      text.take(300))
    assert(text.contains("embed_1a") && text.contains("embed_2b"))
  }

  test("dispatch picks the right extractor per container type") {
    val Some((t1, x1)) = OfficeDocs.extract(sample("ootest.odt"))
    assert(t1 == "application/vnd.oasis.opendocument.text")
    assert(x1.contains("Lorem ipsum"))
    val Some((t2, x2)) = OfficeDocs.extract(sample("test.xlsx"))
    assert(t2.endsWith("spreadsheetml.sheet"))
    assert(norm(x2).startsWith("test.txt This"))
    val Some((t3, _)) = OfficeDocs.extract(sample("ootest.sxw"))
    assert(t3.startsWith("application/vnd.sun.xml"))
  }

  test("xlsx shared strings and inline strings resolve") {
    // build a minimal xlsx with sharedStrings via the zip writer
    val wb = """<?xml version="1.0"?><workbook><sheets>""" +
      """<sheet name="S1" sheetId="1"/></sheets></workbook>"""
    val ss = """<?xml version="1.0"?><sst><si><t>alpha</t></si>""" +
      """<si><r><t>be</t></r><r><t>ta</t></r></si></sst>"""
    val sheet = """<?xml version="1.0"?><worksheet><sheetData>""" +
      """<row><c r="A1" t="s"><v>0</v></c>""" +
      """<c r="B1" t="s"><v>1</v></c>""" +
      """<c r="C1" t="inlineStr"><is><t>inline&amp;x</t></is></c>""" +
      """<c r="D1"><v>42</v></c><c r="E1"/></sheetData></worksheet>"""
    val zip = ZipParse.build(Seq(
      "xl/workbook.xml" -> wb.getBytes("UTF-8"),
      "xl/sharedStrings.xml" -> ss.getBytes("UTF-8"),
      "xl/worksheets/sheet1.xml" -> sheet.getBytes("UTF-8")))
    val Some(text) = OfficeDocs.extractXlsx(zip)
    assert(norm(text) == "S1 alpha beta inline&x 42")
  }

  test("hostile xlsx shared-string indexes never throw (r8 ADVICE)") {
    // non-numeric and >Int.MaxValue <v> bodies in t="s" cells used to
    // hit an unguarded .toInt and crash the parse task
    def xlsx(v: String): Array[Byte] = ZipParse.build(Seq(
      "xl/workbook.xml" ->
        """<workbook><sheets><sheet name="S"/></sheets></workbook>"""
          .getBytes("UTF-8"),
      "xl/sharedStrings.xml" ->
        "<sst><si><t>ok</t></si></sst>".getBytes("UTF-8"),
      "xl/worksheets/sheet1.xml" ->
        (s"""<worksheet><sheetData><row><c r="A1" t="s"><v>$v</v></c>""" +
          """<c r="B1" t="s"><v>0</v></c></row></sheetData></worksheet>""")
          .getBytes("UTF-8")))
    for (v <- Seq("notanint", "99999999999", "-3", "1e4", ""))
      assert(norm(OfficeDocs.extractXlsx(xlsx(v)).getOrElse("")) == "S ok",
        s"v=$v") // hostile cell dropped, rest of sheet survives
  }

  test("EPUB content documents extract through the gate") {
    val epub = ZipParse.build(Seq(
      "mimetype" -> "application/epub+zip".getBytes("UTF-8"),
      "META-INF/container.xml" -> "<container/>".getBytes("UTF-8"),
      "OEBPS/ch1.xhtml" ->
        ("<html><body><p>Chapter one text here.</p>" +
          "</body></html>").getBytes("UTF-8"),
      "OEBPS/ch2.xhtml" ->
        "<html><body>Chapter two follows.</body></html>".getBytes("UTF-8"),
      "OEBPS/style.css" -> "p { color: red }".getBytes("UTF-8")))
    assert(graft.operators.Multimodal.zipContainerType(epub) ==
      "application/epub+zip")
    val Some((t, text)) = OfficeDocs.extract(epub)
    assert(t == "application/epub+zip")
    assert(text == "Chapter one text here.\nChapter two follows.")
    val (st, _, gateText, _) = Parse.parsePage("http://b.example.com/x.epub",
      epub, "application/epub+zip", Parse.Config())
    assert(st == graft.schemas.ParseStatusCodes.Success)
    assert(gateText == text)
  }

  test("malformed containers and RTF never throw") {
    assert(Rtf.parse(null).ok == false)
    assert(Rtf.parse("not rtf".getBytes).ok == false)
    val good = sample("ootest.odt")
    for (n <- Seq(0, 10, 100, 1000, good.length / 2))
      OfficeDocs.extract(good.take(n)) // no throw
    val rtf = sample("test.rtf")
    val rnd = new scala.util.Random(3)
    for (_ <- 1 to 200) {
      val b = rtf.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Rtf.parse(b) // no throw
    }
  }
}
