package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Conformance suite for the hand-rolled HTML parser: the 15 pages,
  * base URLs, and expected title/text/outlink answer tables from the
  * reference's TestDOMContentUtils.java:45-253 (parse-html plugin).
  * Text compares are whitespace-insensitive, exactly like the
  * reference's equalsIgnoreWhitespace.
  */
class HtmlSpec extends AnyFunSuite {

  private case class Page(html: String, base: String, title: String,
      text: String, outlinks: Seq[(String, String)],
      useFormAction: Boolean = true)

  private val pages = Seq(
    Page(
      "<html><head><title> title </title><script> script </script>" +
        "</head><body> body <a href=\"http://www.nutch.org\">" +
        " anchor </a><!--comment--></body></html>",
      "http://www.nutch.org",
      "title", "title body anchor",
      Seq("http://www.nutch.org" -> "anchor")),
    Page(
      "<html><head><title> title </title><script> script </script>" +
        "</head><body> body <a href=\"/\"> home </a><!--comment-->" +
        "<style> style </style> <a href=\"bot.html\"> bots </a>" +
        "</body></html>",
      "http://www.nutch.org/docs/foo.html",
      "title", "title body home bots",
      Seq("http://www.nutch.org/" -> "home",
        "http://www.nutch.org/docs/bot.html" -> "bots")),
    Page(
      "<html><head><title> </title></head><body> " +
        "<a href=\"/\"> separate this <a href=\"ok\"> from this</a></a>" +
        "</body></html>",
      "http://www.nutch.org/docs/",
      "", "separate this from this",
      Seq("http://www.nutch.org/" -> "separate this",
        "http://www.nutch.org/docs/ok" -> "from this")),
    Page(
      "<html><head><title> my title </title></head><body> body " +
        "<ul><li> <a href=\"/\"> home<li> <a href=\"1\"> 1" +
        "<li> <a href=\"2\"> 2</ul></body></html>",
      "http://www.nutch.org/docs/",
      "my title", "my title body home 1 2",
      Seq("http://www.nutch.org/" -> "home",
        "http://www.nutch.org/docs/1" -> "1",
        "http://www.nutch.org/docs/2" -> "2")),
    Page(
      "<html><head><title> my title </title>" +
        "</head><frameset rows=\"20,*\"> <frame src=\"top.html\">" +
        "</frame><frameset cols=\"20,*\"><frame src=\"left.html\">" +
        "<frame src=\"invalid.html\"/></frame>" +
        "<frame src=\"right.html\"></frame></frameset></frameset>" +
        "</body></html>",
      "http://www.nutch.org/frames/",
      "my title", "my title",
      Seq("http://www.nutch.org/frames/top.html" -> "",
        "http://www.nutch.org/frames/left.html" -> "",
        "http://www.nutch.org/frames/invalid.html" -> "",
        "http://www.nutch.org/frames/right.html" -> "")),
    Page(
      "<html><head><title> my title </title></head><body>" +
        "<img src=\"logo.gif\" usemap=\"#green\" border=\"0\">" +
        "<map name=\"green\">" +
        "<area shape=\"polygon\" coords=\"19,44,45,11,87\" href=\"../index.html\">" +
        "<area shape=\"rect\" coords=\"128,132,241,179\" href=\"#bottom\">" +
        "<area shape=\"circle\" coords=\"68,211,35\" href=\"../bot.html\">" +
        "</map><a name=\"bottom\"/><h1> the bottom </h1> " +
        "<iframe src=\"../docs/index.html\"/></body></html>",
      "http://www.nutch.org/maps/",
      "my title", "my title the bottom",
      Seq("http://www.nutch.org/maps/logo.gif" -> "",
        "http://www.nutch.org/index.html" -> "",
        "http://www.nutch.org/maps/#bottom" -> "",
        "http://www.nutch.org/bot.html" -> "",
        "http://www.nutch.org/docs/index.html" -> "")),
    Page(
      "<html><head>\n <title> my\t\n  title\r\n </title>\n </head>\n" +
        " <body>\n    <h1> Whitespace\ttest  </h1> \n" +
        "\t<a href=\"../index.html\">\n  \twhitespace  test\r\n\t</a>  \t\n" +
        "    <p> This is<span> a whitespace<span></span> test</span>." +
        " Newlines\nshould appear as space too.</p><p>Tabs\tare spaces " +
        "too.\n</p>    This\t<b>is a</b> break -&gt;<br>and the line " +
        "after<i> break</i>.<br>\n<table>" +
        "    <tr><td>one</td><td>two</td><td>three</td></tr>\n" +
        "    <tr><td>space here </td><td> space there</td><td>no space</td></tr>" +
        "\t<tr><td>one\r\ntwo</td><td>two\tthree</td><td>three\r\tfour</td></tr>\n" +
        "</table>put some text here<Br>and there." +
        "<h2>End\tthis\rmadness\n!</h2>\r\n" +
        "         .        .        .         .</body>  </html>",
      "http://www.nutch.org/whitespace/",
      "my title",
      "my title Whitespace test whitespace test " +
        "This is a whitespace test . Newlines should appear as space too. " +
        "Tabs are spaces too. This is a break -> and the line after break . " +
        "one two three space here space there no space " +
        "one two two three three four put some text here and there. " +
        "End this madness ! . . . .",
      Seq("http://www.nutch.org/index.html" -> "whitespace test")),
    Page(
      "<html><head></head><body>" +
        "<a href=\"http://www.nutch.org\" rel=\"nofollow\"> ignore </a>" +
        "<a rel=\"nofollow\" href=\"http://www.nutch.org\"> ignore </a>" +
        "</body></html>",
      "http://www.nutch.org//",
      "", "ignore ignore", Seq.empty),
    Page(
      "<html><head></head><body>" +
        "<a href=\"http://www.nutch.org\" rel=\"noreferrer nofollow\"> ignore </a>" +
        "<a rel=\"nofollow noreferrer\" href=\"http://www.nutch.org\"> ignore </a>" +
        "</body></html>",
      "http://www.nutch.org//",
      "", "ignore ignore", Seq.empty),
    Page(
      "<html><head></head><body>" +
        "<form method='POST' action='/search.jsp'><input type=text>" +
        "<input type=submit><p>test1</p></form>" +
        "<form method='GET' action='/dummy.jsp'><input type=text>" +
        "<input type=submit><p>test2</p></form></body></html>",
      "http://www.nutch.org/",
      "", "test1 test2",
      Seq("http://www.nutch.org/dummy.jsp" -> "test2")),
    Page(
      "<html><head></head><body>" +
        "<form method='POST' action='/search.jsp'><input type=text>" +
        "<input type=submit><p>test1</p></form>" +
        "<form method='GET' action='/dummy.jsp'><input type=text>" +
        "<input type=submit><p>test2</p></form></body></html>",
      "http://www.nutch.org/",
      "", "test1 test2", Seq.empty, useFormAction = false),
    Page(
      "<html><head><title> title </title></head><body>" +
        "<a href=\";x\">anchor1</a><a href=\"g;x\">anchor2</a>" +
        "<a href=\"g;x?y#s\">anchor3</a></body></html>",
      "http://www.nutch.org/",
      "title", "title anchor1 anchor2 anchor3",
      Seq("http://www.nutch.org/;x" -> "anchor1",
        "http://www.nutch.org/g;x" -> "anchor2",
        "http://www.nutch.org/g;x?y#s" -> "anchor3")),
    Page(
      "<html><head><title> title </title></head><body>" +
        "<a href=\"g\">anchor1</a><a href=\"g?y#s\">anchor2</a>" +
        "<a href=\"?y=1\">anchor3</a><a href=\"?y=1#s\">anchor4</a>" +
        "<a href=\"?y=1;somethingelse\">anchor5</a></body></html>",
      "http://www.nutch.org/;something",
      "title", "title anchor1 anchor2 anchor3 anchor4 anchor5",
      Seq("http://www.nutch.org/g" -> "anchor1",
        "http://www.nutch.org/g?y#s" -> "anchor2",
        "http://www.nutch.org/;something?y=1" -> "anchor3",
        "http://www.nutch.org/;something?y=1#s" -> "anchor4",
        "http://www.nutch.org/;something?y=1;somethingelse" -> "anchor5")),
    Page(
      "<html><head><title> title </title></head><body>" +
        "<a href=\"g\"><!--no anchor--></a>" +
        "<a href=\"g1\"> <!--whitespace-->  </a>" +
        "<a href=\"g2\">  <img src=test.gif alt='bla bla'> </a>" +
        "</body></html>",
      "http://www.nutch.org/",
      "title", "title",
      Seq("http://www.nutch.org/g" -> "",
        "http://www.nutch.org/g1" -> "",
        "http://www.nutch.org/g2" -> "bla bla",
        "http://www.nutch.org/test.gif" -> "bla bla")),
    Page(
      "<html><head><title> </title></head><body> " +
        "<video width=\"320\" height=\"240\" controls> " +
        "<source src=\"movie.mp4\" type=\"video/mp4\">" +
        "</video></body></html>",
      "http://www.nutch.org/",
      "", "",
      Seq("http://www.nutch.org/movie.mp4" -> "")))

  private def tokens(s: String): Seq[String] =
    s.split("\\s+").filter(_.nonEmpty).toSeq

  test("getText matches the reference answer table") {
    pages.zipWithIndex.foreach { case (p, i) =>
      val got = Html.getText(Html.parse(p.html))
      assert(tokens(got) == tokens(p.text),
        s"page $i text: expected '${p.text}' got '$got'")
    }
  }

  test("getTitle matches the reference answer table") {
    pages.zipWithIndex.foreach { case (p, i) =>
      val got = Html.getTitle(Html.parse(p.html))
      assert(tokens(got) == tokens(p.title),
        s"page $i title: expected '${p.title}' got '$got'")
    }
  }

  test("getOutlinks matches the reference answer table") {
    pages.zipWithIndex.foreach { case (p, i) =>
      val got = Html.getOutlinks(p.base, Html.parse(p.html),
          useFormAction = p.useFormAction)
        .map(o => o.toUrl -> o.anchor)
      assert(got == p.outlinks,
        s"page $i outlinks: expected ${p.outlinks} got $got")
    }
  }

  test("base href re-roots relative links via parsePage") {
    val html = "<html><head><base href=\"http://other.example.com/dir/\">" +
      "<title>t</title></head><body><a href=\"x.html\">x</a></body></html>"
    val (st, _, _, links) = Parse.parsePage("http://www.nutch.org/",
      html.getBytes("UTF-8"), "text/html", Parse.Config())
    assert(st == graft.schemas.ParseStatusCodes.Success)
    assert(links.map(_.toUrl) == Seq("http://other.example.com/dir/x.html"))
  }

  test("file:/ftp: outlinks are opt-in (reference scheme-denylist posture)") {
    val html = "<html><body>" +
      "<a href=\"http://ok.com/a\">a</a>" +
      "<a href=\"file:///etc/passwd\">f</a>" +
      "<a href=\"ftp://ftp.example.com/pub\">p</a>" +
      "<a href=\"mailto:x@y.z\">m</a></body></html>"
    val bytes = html.getBytes("UTF-8")
    val (_, _, _, deny) = Parse.parsePage("http://h.com/",
      bytes, "text/html", Parse.Config())
    assert(deny.map(_.toUrl) == Seq("http://ok.com/a"),
      "default config must not follow file:/ftp: (hostile HTML could " +
        "otherwise steer a FileProtocol deployment into local files)")
    val (_, _, _, allow) = Parse.parsePage("http://h.com/",
      bytes, "text/html", Parse.Config(followFileSchemes = true))
    assert(allow.map(_.toUrl) == Seq("http://ok.com/a",
      "file:///etc/passwd", "ftp://ftp.example.com/pub"))
  }

  test("tokenizer survives malformed real-web markup") {
    // unclosed tags, stray end tags, unquoted/duplicate attrs, CDATA,
    // conditional-comment-ish junk, entities in attrs, EOF inside tag
    val html = "<!DOCTYPE html><!--[if IE]>junk<![endif]--><html><body>" +
      "<p>one<p>two<div class=c id=d class=zzz>three" +
      "<![CDATA[ not text ]]><a href=\"/a?x=1&amp;y=2\">link</div></a>" +
      "</body><junk"
    val root = Html.parse(html)
    assert(tokens(Html.getText(root)) == Seq("one", "two", "three", "link"))
    val links = Html.getOutlinks("http://e.com/", root)
    assert(links.map(_.toUrl) == Seq("http://e.com/a?x=1&y=2"))
  }

  test("script and style content never leaks into text") {
    val html = "<html><body>before<script>var a = '<b>not text</b>';" +
      "</script><style>p { color: red }</style>after</body></html>"
    assert(tokens(Html.getText(Html.parse(html))) == Seq("before", "after"))
  }

  test("'</scriptfoo' inside script data does not end the element") {
    // HTML5 script-data rule: '</script' only closes when followed by
    // '>', '/', or whitespace — a longer name is still script content
    val html = "<html><body><script>document.write('</scriptfoo>')" +
      "</script><p>Hello <a href=\"http://x.example.com/\">link</a></p>" +
      "</body></html>"
    val root = Html.parse(html)
    assert(tokens(Html.getText(root)) == Seq("Hello", "link"))
    assert(Html.getOutlinks("http://x.example.com/", root)
      .map(_.toUrl) == Seq("http://x.example.com/"))
  }

  test("method=post only suppresses forms, never anchors") {
    val html = "<html><body>" +
      "<a href=\"http://t.example.com/next\" method=\"post\">go</a>" +
      "</body></html>"
    assert(Html.getOutlinks("http://t.example.com/", Html.parse(html))
      .map(_.toUrl) == Seq("http://t.example.com/next"))
  }

  test("foreachOutlink stops the walk when the callback says so") {
    val html = "<html><body>" + (1 to 50).map(i =>
      s"""<a href="http://cap.example.com/p$i">a$i</a>""").mkString +
      "</body></html>"
    var seen = 0
    Html.foreachOutlink("http://cap.example.com/", Html.parse(html)) { _ =>
      seen += 1; seen < 3
    }
    assert(seen == 3)
    // parsePage honors the cap through the same early exit
    val (_, _, _, links) = Parse.parsePage("http://cap.example.com/",
      html.getBytes("UTF-8"), "text/html",
      Parse.Config(maxOutlinksPerPage = 5))
    assert(links.length == 5)
  }

  test("entities decode in text, attrs, and title; malformed stay literal") {
    assert(Html.decodeEntities("a &lt;b&gt; &amp; &#65;&#x42; c") ==
      "a <b> & AB c")
    assert(Html.decodeEntities("AT&T and R&D; x & y") == "AT&T and R&D; x & y")
    val t = Html.getTitle(Html.parse("<title>a &amp; b</title>"))
    assert(t == "a & b")
  }

  test("renderDom: normalized serialization of the parsed tree") {
    // unquoted attr -> quoted; entity round-trips escaped; void element
    // without close tag; implied </p> materialized
    assert(Html.renderDom(Html.parse(
      "<html><body><p class=x>A &amp; B<br></body></html>")) ==
      "<html><body><p class=\"x\">A &amp; B<br></p></body></html>")
    // comments preserved; script content verbatim (no escaping), even
    // with markup-significant characters inside
    val js = "<body><!-- note --><script>if (a < b && c) go()</script></body>"
    assert(Html.renderDom(Html.parse(js)) == js)
    // attribute values re-escape quotes
    assert(Html.renderDom(Html.parse("<a title='say \"hi\"' href=/x>y</a>")) ==
      "<a title=\"say &quot;hi&quot;\" href=\"/x\">y</a>")
  }
}
