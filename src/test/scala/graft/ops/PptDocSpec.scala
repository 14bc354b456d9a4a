package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** PPT record-tree text extraction: both text atom kinds, nesting,
  * encryption refusal, hostile input. */
class PptDocSpec extends AnyFunSuite {

  private val ppt = PptDoc.synth(Seq(
    "Slide title in unicode é", "bytes atom line", "closing remark"))

  test("extracts both atom kinds in record order") {
    val Some(text) = PptDoc.extract(ppt)
    assert(text ==
      "Slide title in unicode é\nbytes atom line\nclosing remark")
  }

  test("sniffs as OLE2 and routes through the gate") {
    assert(graft.operators.Multimodal.sniff(ppt) ==
      "application/x-ole-storage")
    val (st, _, text, _) = Parse.parsePage("http://x.example.com/d.ppt",
      ppt, "application/vnd.ms-powerpoint", Parse.Config())
    assert(st == graft.schemas.ParseStatusCodes.Success)
    assert(text.contains("bytes atom line"))
  }

  test("encrypted decks refuse honestly") {
    // plant a CryptSession10Container record inside the document
    val enc = PptDoc.synth(Seq("secret"))
    val Some(cfb) = WordDoc.Cfb(enc)
    val Some(doc) = cfb.stream("PowerPoint Document")
    // overwrite the inner slide container's type with 0x2F14
    var p = 8 // inside the Document container
    doc(p + 2) = 0x14.toByte; doc(p + 3) = 0x2F.toByte
    assert(PptDoc.extract(WordDoc.Cfb.build(
      Seq("PowerPoint Document" -> doc))).isEmpty)
  }

  test("malformed inputs never throw") {
    assert(PptDoc.extract(null).isEmpty)
    for (n <- 0 until math.min(ppt.length, 3000))
      PptDoc.extract(ppt.take(n)) // no throw
    val rnd = new scala.util.Random(41)
    for (_ <- 1 to 400) {
      val b = ppt.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      PptDoc.extract(b) // no throw
    }
  }
}
