package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Main-content extraction against the reference's own
  * TestBoilerpipeExtraction fixture and assertions, plus the block
  * segmentation and classifier rules on planted pages. */
class BoilerplateSpec extends AnyFunSuite {

  // the reference's HTML_WITH_BOILERPLATE, verbatim
  private val refHtml =
    "<!DOCTYPE html><html><head><title>Article Title</title></head><body>" +
      "<div id='header'>Navigation | Menu | Links</div>" +
      "<div id='content'>" +
      "<h1>Main Article Heading</h1>" +
      "<p>This is the main article content that should be extracted. " +
      "It contains important information about the topic.</p>" +
      "<p>Another paragraph with meaningful content that adds value.</p>" +
      "</div>" +
      "<div id='footer'>Copyright 2024 | Terms | Privacy</div>" +
      "</body></html>"

  test("the reference's TestBoilerpipeExtraction assertions hold") {
    val text = Boilerplate.mainContent(refHtml)
    assert(text.contains("Main Article Heading"))
    assert(text.contains("main article content"))
    // and the furniture is actually removed (the point of the feature)
    assert(!text.contains("Navigation"))
    assert(!text.contains("Copyright"))
  }

  test("block segmentation: words, anchor words, link density") {
    val bs = Boilerplate.blocks(Html.parse(
      "<body><div>Plain four word block</div>" +
        "<div>Mostly <a href='/x'>linked words here now</a> block</div>" +
        "<h2>A heading</h2></body>"))
    assert(bs.map(_.text) == Seq("Plain four word block",
      "Mostly linked words here now block", "A heading"))
    assert(bs(0).words == 4 && bs(0).anchorWords == 0)
    assert(bs(1).words == 6 && bs(1).anchorWords == 4)
    assert(bs(1).linkDensity > 0.5)
    assert(bs(2).heading)
  }

  test("link-dense blocks never classify as content") {
    val html = "<body><ul>" +
      (1 to 30).map(i => s"<li><a href='/$i'>Item number $i</a></li>")
        .mkString + "</ul>" +
      "<p>" + (1 to 45).map(i => s"word$i").mkString(" ") + "</p></body>"
    val text = Boilerplate.mainContent(html)
    assert(!text.contains("Item number"))
    // after a link-dense block the paper's threshold jumps to 40 words
    // (a 20-word paragraph would be dropped as list furniture)
    assert(text.contains("word1"))
  }

  test("terminating footer ends the article even with wordy trailing junk") {
    val html = "<body><p>" +
      (1 to 20).map(i => s"body$i").mkString(" ") + "</p>" +
      "<div>Copyright 2024 Example</div>" +
      "<p>" + (1 to 20).map(i => s"junk$i").mkString(" ") + "</p></body>"
    val text = Boilerplate.mainContent(html)
    assert(text.contains("body1") && !text.contains("junk1"))
  }

  test("the parse gate honors extractor=boilerpipe (tika.extractor parity)") {
    val full = Parse.parsePage("http://a.example.com/", refHtml.getBytes,
      "text/html", Parse.Config())
    val main = Parse.parsePage("http://a.example.com/", refHtml.getBytes,
      "text/html", Parse.Config(extractor = "boilerpipe"))
    assert(full._3.contains("Navigation")) // default: full DOM text
    assert(main._3.contains("main article content"))
    assert(!main._3.contains("Navigation") && !main._3.contains("Copyright"))
    assert(main._2 == full._2) // title unchanged
  }

  test("short navigation between long paragraphs survives the rules") {
    // the prev.words > 4 arm: a short connective block between real
    // paragraphs is kept (the paper's rule, not an accident)
    val html = "<body><p>" + (1 to 18).map(i => s"alpha$i").mkString(" ") +
      "</p><p>short bridge text</p><p>" +
      (1 to 18).map(i => s"beta$i").mkString(" ") + "</p></body>"
    val text = Boilerplate.mainContent(html)
    assert(text.contains("short bridge text"))
  }
}
