package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** BIFF8 .xls extraction: SST with a string spanning into a Continue
  * record, LabelSst/Number/RK/Label cells, number formatting, and
  * hostile input. */
class XlsDocSpec extends AnyFunSuite {

  private val xls = XlsDoc.synth("Sheet One",
    Seq("alpha", "beta", "spanning string value"),
    3.5, 1234, -250, "inline text")

  test("extracts sheet name and every cell kind in order") {
    val Some(text) = XlsDoc.extract(xls)
    assert(text == "Sheet One alpha beta spanning string value " +
      "3.5 1234 -2.5 inline text", text)
  }

  test("the spanning SST string really crosses a Continue record") {
    // the synth puts only 2 chars of the last string in the SST record
    val Some(cfb) = WordDoc.Cfb(xls)
    val Some(wb) = cfb.stream("Workbook")
    def u16(p: Int) = (wb(p) & 0xff) | ((wb(p + 1) & 0xff) << 8)
    var p = 0
    var sstLen = -1
    while (sstLen < 0 && p + 4 <= wb.length) {
      if (u16(p) == 0x00FC) sstLen = u16(p + 2)
      else p += 4 + u16(p + 2)
    }
    assert(sstLen > 0)
    val inSst = new String(wb, p + 4, sstLen, "ISO-8859-1")
    assert(inSst.contains("sp") && !inSst.contains("spanning"))
  }

  test("RK encodings: integer and div-100 forms") {
    val Some(text) = XlsDoc.extract(
      XlsDoc.synth("S", Seq("x"), 0.25, -7, 12345, "y"))
    assert(text.contains(" -7 "))
    assert(text.contains(" 123.45 "))
    assert(text.contains(" 0.25 "))
  }

  test("sniffed OLE2 routing: parsetext-style type resolution") {
    assert(graft.operators.Multimodal.sniff(xls) ==
      "application/x-ole-storage")
  }

  test("encrypted and malformed workbooks refuse without throwing") {
    assert(XlsDoc.extract(null).isEmpty)
    // plant a FilePass record at the head of the globals
    val Some(cfb) = WordDoc.Cfb(xls)
    val Some(wb) = cfb.stream("Workbook")
    val enc = Array[Byte](0x2F, 0, 4, 0, 1, 0, 1, 0) ++ wb
    assert(XlsDoc.extract(WordDoc.Cfb.build(Seq("Workbook" -> enc))).isEmpty)
    for (n <- 0 until math.min(xls.length, 3000))
      XlsDoc.extract(xls.take(n)) // no throw
    val rnd = new scala.util.Random(31)
    for (_ <- 1 to 400) {
      val b = xls.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      XlsDoc.extract(b) // no throw
    }
  }
}
