package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's basic-normalizer conformance table
  * (urlnormalizer-basic TestBasicURLNormalizer.java:46-148) for the full
  * scalar Urls.normalize — escape canonicalization, dot-segment
  * resolution, case/port/fragment rules. */
class UrlsNormalizeSpec extends AnyFunSuite {

  private def n(in: String, expected: String): Unit =
    assert(Urls.normalize(in).contains(expected), s"normalize($in)")

  test("unescape escapes of unreserved characters") {
    n("http://foo.com/%66oo.html", "http://foo.com/foo.html")
    n("http://foo.com/%66oo.htm%6c", "http://foo.com/foo.html")
    n("http://foo.com/%66oo.ht%6dl", "http://foo.com/foo.html")
    n("http://foo.com/%66oo.ht%6d%6c", "http://foo.com/foo.html")
  }

  test("keep + uppercase escapes of reserved/control/non-ascii bytes") {
    n("http://foo.com/%66oo.htm%C0", "http://foo.com/foo.htm%C0")
    n("http://foo.com/%66oo.htm%1A", "http://foo.com/foo.htm%1A")
    n("http://foo.com/%66oo.htm%c0", "http://foo.com/foo.htm%C0")
    n("http://foo.com/you%20too.html", "http://foo.com/you%20too.html")
    n("http://foo.com/file.html%23cz", "http://foo.com/file.html%23cz")
    n("http://foo.com/fast/dir%2fcz", "http://foo.com/fast/dir%2Fcz")
    n("http://x.com/foo%c2%80", "http://x.com/foo%C2%80")
  }

  test("escape stray unsafe literals, utf-8 for non-ascii") {
    n("http://foo.com/you too.html", "http://foo.com/you%20too.html")
    n("http://foo.com/\u001a!", "http://foo.com/%1A!")
    n("http://foo.com/\u0001!", "http://foo.com/%01!")
    n("http://mydomain.com/en Español.aspx",
      "http://mydomain.com/en%20Espa%C3%B1ol.aspx")
    n("http://x.com/?x[y]=1", "http://x.com/?x%5By%5D=1")
    n("http://x.com/foo\u0080", "http://x.com/foo%C2%80")
  }

  test("query escapes keep their semantics") {
    n("http://x.com/s?q=a%26b&m=10", "http://x.com/s?q=a%26b&m=10")
    n("http://google.com/search?q=c%2B%2B", "http://google.com/search?q=c%2B%2B")
    n("http://x.com/s?q=a+b", "http://x.com/s?q=a+b")
  }

  test("case, whitespace, ports, fragments") {
    n(" http://foo.com/ ", "http://foo.com/")
    n("HTTP://foo.com/", "http://foo.com/")
    n("http://Foo.Com/index.html", "http://foo.com/index.html")
    n("https://example%2Ecom/", "https://example.com/")
    n("http://foo.com:80/index.html", "http://foo.com/index.html")
    n("https://foo.com:443/index.html", "https://foo.com/index.html")
    n("http://foo.com:81/", "http://foo.com:81/")
    n("http://example.com:/", "http://example.com/")
    n("http://foo.com", "http://foo.com/")
    n("http://foo.com/foo.html#ref", "http://foo.com/foo.html")
    n("http://bücher.de/", "http://bücher.de/")
  }

  test("dot-segment resolution") {
    n("http://x.com/./a/../%66.html", "http://x.com/f.html")
    n("http://foo.com/..", "http://foo.com/")
    n("http://foo.com/aa/./foo.html", "http://foo.com/aa/foo.html")
    n("http://foo.com/aa/../", "http://foo.com/")
  }

  test("unparseable urls are dropped") {
    assert(Urls.normalize("not a url").isEmpty)
    assert(Urls.normalize("").isEmpty)
    assert(Urls.normalize(null).isEmpty)
  }
}
