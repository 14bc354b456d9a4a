package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class JsParseSpec extends AnyFunSuite {

  private val base = "http://www.example.com/dir/page.html"

  test("quoted literals with URL shape become outlinks") {
    val js = """var a = "http://other.example.com/x.html";
               |var b = 'sub/rel.html';
               |var c = "www.bare-host.com/y";
               |var d = "notaurl";
               |var e = "two words/no.html";""".stripMargin
    val links = JsParse.getJsLinks(js, "", base).map(_.toUrl)
    assert(links.contains("http://other.example.com/x.html"))
    assert(links.contains("http://www.example.com/dir/sub/rel.html"))
    assert(links.contains("http://www.bare-host.com/y"))
    assert(!links.exists(_.contains("notaurl")))
    // literals with whitespace never match the string pattern
    assert(!links.exists(_.contains("two")))
  }

  test("&amp; unescapes in discovered urls") {
    val js = """go("http://e.com/p?a=1&amp;b=2");"""
    assert(JsParse.getJsLinks(js, "", base).map(_.toUrl) ==
      Seq("http://e.com/p?a=1&b=2"))
  }

  test("html walk: script bodies, on* handlers, javascript: hrefs") {
    val html =
      """<html><body>
        |<script>var u = "http://from-script.example.com/a.html";</script>
        |<div onclick="nav('http://from-onclick.example.com/b.html')">x</div>
        |<a href="javascript:open('http://from-href.example.com/c.html')">y</a>
        |<a href="plain.html">normal link, not scanned</a>
        |</body></html>""".stripMargin
    val links = JsParse.htmlJsLinks(Html.parse(html), base).map(_.toUrl)
    assert(links == Seq(
      "http://from-script.example.com/a.html",
      "http://from-onclick.example.com/b.html",
      "http://from-href.example.com/c.html"))
  }

  test("standalone .js parse: first line title (80-char cap), full text") {
    val script = "// my library\nvar x = \"http://lib.example.com/l.js\";"
    val (title, text, links) =
      JsParse.parseJs("http://e.com/lib.js", script)
    assert(title == "// my library")
    assert(text == script)
    assert(links.map(_.toUrl) == Seq("http://lib.example.com/l.js"))
    val long = "x" * 200
    assert(JsParse.parseJs("http://e.com/a.js", long)._1.length == 80)
  }
}
