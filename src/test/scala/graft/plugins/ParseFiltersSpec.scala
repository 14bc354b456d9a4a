package graft.plugins

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Html
import graft.plugins.IndexingFilters._
import graft.plugins.ParseFilters._

class ParseFiltersSpec extends AnyFunSuite {

  test("rel-tag harvest: href+rel=tag anchors, decoded last segment, sorted set") {
    val html =
      """<html><body>
        |<a href="http://tags.example.com/tag/scala" rel="tag">s</a>
        |<a href="http://tags.example.com/tag/big%20data" rel="TAG">b</a>
        |<a href="http://tags.example.com/tag/scala" rel="tag">dup</a>
        |<a href="http://tags.example.com/tag/notag">no rel</a>
        |<a rel="tag">no href</a>
        |<a href="/relative/tag" rel="tag">relative dropped</a>
        |</body></html>""".stripMargin
    assert(relTags(Html.parse(html)) == Seq("big data", "scala"))
  }

  test("parsefilter-regex: html vs text sources, true/false fields") {
    val rules = RegexParseRule.parseRules(
      """# comment
        |hasPrice	text	\$\d+
        |hasForm	html	<form\b
        |badrule	nowhere	x
        |badregex	text	[unclosed""".stripMargin)
    assert(rules.map(_.field) == Seq("hasPrice", "hasForm"))
    val html = "<html><body><form action=\"/x\">Buy now</form></body></html>"
    val text = "Buy now for $25"
    assert(regexFlags(html, text, rules) ==
      Seq("hasPrice" -> "true", "hasForm" -> "true"))
    assert(regexFlags("<html><p>no</p></html>", "nothing here", rules) ==
      Seq("hasPrice" -> "false", "hasForm" -> "false"))
  }

  test("index-links: same-host suppression and hosts-only dedup") {
    val url = "http://www.site.com/page"
    val outs = Seq("http://www.site.com/other", "http://a.example.com/1",
      "http://a.example.com/2", "bad url")
    val ins = Seq("http://b.example.com/x", "http://www.site.com/parent")
    val (o1, i1) = linkFields(url, outs, ins)
    assert(o1 == Seq("http://www.site.com/other", "http://a.example.com/1",
      "http://a.example.com/2"))
    assert(i1 == Seq("http://b.example.com/x", "http://www.site.com/parent"))
    val (o2, i2) = linkFields(url, outs, ins,
      ignoreSameHostOut = true, ignoreSameHostIn = true)
    assert(o2 == Seq("http://a.example.com/1", "http://a.example.com/2"))
    assert(i2 == Seq("http://b.example.com/x"))
    val (o3, _) = linkFields(url, outs, ins, hostsOnly = true)
    assert(o3 == Seq("www.site.com", "a.example.com"))
  }

  test("index-replace: host/url match sets, field rewrite, toField") {
    val conf = ReplaceConf.parse(
      """hostmatch=.*\.com
        |title=/old/new/
        |urlmatch=.*\/special\/.*
        |title:subtitle=/(.+)/[$1]/
        |hostmatch=nomatch\.example
        |title=/x/y/""".stripMargin)
    val doc = Map("host" -> "www.site.com", "url" -> "http://www.site.com/p",
      "title" -> "old title")
    val out = ReplaceConf.parse("hostmatch=.*\\.com\ntitle=/old/new/")(doc)
    assert(out("title") == "new title")
    // url set writes into a NEW field, source intact
    val doc2 = Map("host" -> "www.site.com",
      "url" -> "http://www.site.com/special/p", "title" -> "old T")
    val out2 = conf(doc2)
    assert(out2("title") == "new T") // host set rewrote in place
    assert(out2("subtitle") == "[new T]") // url set ran after, on the rewrite
    // non-matching host set never fires
    assert(!out2("title").contains("y"))
    // case-insensitive flag tail (2 = Pattern.CASE_INSENSITIVE)
    val ci = ReplaceConf.parse("title=/OLD/new/2")(
      Map("host" -> "h", "title" -> "old x"))
    assert(ci("title") == "new x")
  }
}
