package graft.net

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Conformance suites for the URL filter engines (FIXTURES.md §A7).
  *
  * The regex and fast engines run the reference's own sample rule/url
  * pairs verbatim (`+url` must be accepted, `-url` rejected) when the
  * read-only reference checkout is present; the prefix/suffix engines run
  * the reference's JUnit data tables (TestPrefixURLFilter.java:33-58,
  * TestSuffixURLFilter.java:34-62).
  */
class UrlFilterConformanceSpec extends AnyFunSuite {

  private val regexSampleDir =
    "/root/reference/src/plugin/urlfilter-regex/sample"
  private val fastSampleDir =
    "/root/reference/src/plugin/urlfilter-fast/sample"

  private def linesOf(path: String): Seq[String] =
    Files.readAllLines(Paths.get(path)).asScala.toSeq

  private def checkUrls(name: String, accepts: String => Boolean,
      urlLines: Seq[String]): Unit =
    urlLines.filter(l => l.startsWith("+") || l.startsWith("-")).foreach {
      line =>
        val url = line.substring(1)
        val expected = line.startsWith("+")
        assert(accepts(url) == expected,
          s"$name: $url expected ${if (expected) "accept" else "reject"}")
    }

  for (sample <- Seq("WholeWebCrawling", "IntranetCrawling", "Benchmarks",
      "nutch1838")) {
    test(s"urlfilter-regex sample conformance: $sample") {
      assume(Files.exists(Paths.get(s"$regexSampleDir/$sample.rules")))
      val filter = RegexUrlFilter.parse(
        linesOf(s"$regexSampleDir/$sample.rules").iterator)
      checkUrls(sample, filter.accepts,
        linesOf(s"$regexSampleDir/$sample.urls"))
    }
  }

  // --- automaton: same grammar, whole-string acceptance ---

  private val automatonSampleDir =
    "/root/reference/src/plugin/urlfilter-automaton/sample"

  for (sample <- Seq("WholeWebCrawling", "IntranetCrawling", "Benchmarks")) {
    test(s"urlfilter-automaton sample conformance: $sample") {
      assume(Files.exists(Paths.get(s"$automatonSampleDir/$sample.rules")))
      val filter = AutomatonUrlFilter.parse(
        linesOf(s"$automatonSampleDir/$sample.rules").iterator)
      checkUrls(sample, filter.accepts,
        linesOf(s"$automatonSampleDir/$sample.urls"))
    }
  }

  test("automaton full-match differs from regex substring search") {
    // '-nutch' as a substring rule rejects any url containing it; as an
    // automaton rule it only matches the exact string 'nutch'
    val sub = RegexUrlFilter.parse(Iterator("-nutch", "+."))
    val full = AutomatonUrlFilter.parse(Iterator("-nutch", "+.*"))
    assert(!sub.accepts("http://nutch.example.com/"))
    assert(full.accepts("http://nutch.example.com/"))
  }

  // --- validator: TestUrlValidator.java:41-76 table ---

  test("urlfilter-validator conformance table") {
    val v = ValidatorUrlFilter
    assert(!v.accepts("example.com/file[/].html"))
    assert(!v.accepts("http://www.example.com/space here.html"))
    assert(!v.accepts("/main.html"))
    assert(!v.accepts("www.example.com/main.html"))
    assert(!v.accepts("ftp:www.example.com/main.html"))
    assert(!v.accepts("http://999.000.456.32/nutch/trunk/README.txt"))
    assert(!v.accepts(" http://www.example.com/ma|in\\toc.html"))
    assert(v.accepts("https://issues.apache.org/jira/NUTCH-1127"))
    assert(v.accepts("http://domain.tld/function.cgi?url=http://fonzi.com/" +
      "&amp;name=Fonzi&amp;mood=happy&amp;coat=leather"))
    assert(v.accepts("http://validator.w3.org/feed/check.cgi?url=" +
      "http%3A%2F%2Ffeeds.feedburner.com%2Fperishablepress"))
    assert(v.accepts("ftp://alfa.bravo.pi/mike/check/plan.pdf"))
  }

  test("urlfilter-fast sample conformance") {
    assume(Files.exists(Paths.get(s"$fastSampleDir/fast-urlfilter-test.txt")))
    val filter = FastUrlFilter.parse(
      linesOf(s"$fastSampleDir/fast-urlfilter-test.txt").iterator)
    checkUrls("fast", filter.accepts, linesOf(s"$fastSampleDir/test.urls"))
  }

  // --- prefix: TestPrefixURLFilter.java data table ---

  test("urlfilter-prefix: accept iff a configured prefix matches") {
    val filter = PrefixUrlFilter.parse(Iterator(
      "# this is a comment", "", "http://", "https://", "file://", "ftp://"))
    assert(filter.accepts("http://www.example.com/"))
    assert(filter.accepts("https://www.example.com/"))
    assert(filter.accepts("ftp://www.example.com/"))
    assert(filter.accepts("file://www.example.com/"))
    assert(!filter.accepts("abcd://www.example.com/"))
    assert(!filter.accepts("www.example.com/"))
  }

  // --- suffix: TestSuffixURLFilter.java data tables ---

  private val suffixUrls = Seq(
    "http://www.example.com/test.gif", "http://www.example.com/TEST.GIF",
    "http://www.example.com/test.jpg", "http://www.example.com/test.JPG",
    "http://www.example.com/test.html", "http://www.example.com/test.HTML",
    "http://www.example.com/test.html?q=abc.js",
    "http://www.example.com/test.js?foo=bar&baz=bar#12333")

  private def suffixFilter(modeAccept: Boolean, ignoreCase: Boolean,
      fromPath: Boolean) =
    new SuffixUrlFilter(Seq(".gif", ".jpg", ".js"), modeAccept, ignoreCase,
      fromPath)

  test("urlfilter-suffix mode accept (deny-listed suffixes)") {
    val f = suffixFilter(modeAccept = true, ignoreCase = false,
      fromPath = false)
    val expected = Seq(false, true, false, true, true, true, false, true)
    suffixUrls.zip(expected).foreach { case (u, e) =>
      assert(f.accepts(u) == e, u)
    }
  }

  test("urlfilter-suffix mode reject (allow-listed suffixes)") {
    val f = suffixFilter(modeAccept = false, ignoreCase = false,
      fromPath = false)
    val expected = Seq(true, false, true, false, false, false, true, false)
    suffixUrls.zip(expected).foreach { case (u, e) =>
      assert(f.accepts(u) == e, u)
    }
  }

  test("urlfilter-suffix mode accept, ignore case") {
    val f = suffixFilter(modeAccept = true, ignoreCase = true,
      fromPath = false)
    val expected = Seq(false, false, false, false, true, true, false, true)
    suffixUrls.zip(expected).foreach { case (u, e) =>
      assert(f.accepts(u) == e, u)
    }
  }

  test("urlfilter-suffix mode accept, path-only matching") {
    val f = suffixFilter(modeAccept = true, ignoreCase = false,
      fromPath = true)
    val expected = Seq(false, true, false, true, true, true, true, false)
    suffixUrls.zip(expected).foreach { case (u, e) =>
      assert(f.accepts(u) == e, u)
    }
  }

  // --- chain + misc ---

  test("chain: first rejecting filter wins") {
    val chain = new UrlFilterChain(Seq(
      PrefixUrlFilter.parse(Iterator("http://", "https://")),
      suffixFilter(modeAccept = true, ignoreCase = true, fromPath = false)))
    assert(chain.accepts("http://a.com/x.html"))
    assert(!chain.accepts("ftp://a.com/x.html")) // prefix rejects
    assert(!chain.accepts("http://a.com/x.GIF")) // suffix rejects
  }

  test("regex scoped rules only fire for their host/domain (NUTCH-1838)") {
    val f = RegexUrlFilter.parse(Iterator(
      "> www.example.org", "-skip", "<",
      "> www.example.com", "+skip", "<",
      "-."))
    assert(!f.accepts("http://www.example.org/skip-me-now"))
    assert(f.accepts("http://www.example.com/noone-can-skip-me"))
    assert(!f.accepts("http://www.example.nl/i-am-filtered"))
  }

  test("toColumn refuses scoped rule sets") {
    val f = RegexUrlFilter.parse(Iterator("> h.com", "-x", "<", "+."))
    intercept[IllegalArgumentException] {
      f.toColumn(org.apache.spark.sql.functions.col("u"))
    }
  }

  // --- urlfilter-domain / urlfilter-domaindenylist ---
  // The reference's sample rule file + assertion tables
  // (urlfilter-domain/data/hosts.txt, TestDomainURLFilter.java:30-47,
  // TestDomainDenylistURLFilter.java:30-47): suffix, then registrable
  // domain, then exact host.

  private val domainRules = Iterator(
    "# comments start with the pound sign",
    "net", "apache.org", "be", "www.yahoo.com")

  private val domainTable = Seq(
    "http://lucene.apache.org" -> true, // domain
    "http://hadoop.apache.org" -> true, // domain
    "http://www.apache.org" -> true, // domain
    "http://www.google.com" -> false,
    "http://mail.yahoo.com" -> false, // host-only entry, other host
    "http://www.foobar.net" -> true, // suffix
    "http://www.foobas.net" -> true, // suffix
    "http://www.yahoo.com" -> true, // exact host
    "http://www.foobar.be" -> true, // suffix
    "http://www.adobe.com" -> false)

  test("urlfilter-domain allowlist matches the reference table") {
    val f = DomainUrlFilter.parse(domainRules, deny = false)
    domainTable.foreach { case (u, e) => assert(f.accepts(u) == e, u) }
  }

  test("urlfilter-domaindenylist inverts it") {
    val f = DomainUrlFilter.parse(
      Iterator("net", "apache.org", "be", "www.yahoo.com"), deny = true)
    domainTable.foreach { case (u, e) => assert(f.accepts(u) == !e, u) }
  }

  test("urlfilter-domain: empty rule set allows everything (NUTCH-2189)") {
    val allow = DomainUrlFilter.parse(Iterator.empty, deny = false)
    val deny = DomainUrlFilter.parse(Iterator.empty, deny = true)
    assert(allow.accepts("http://anything.example.com/"))
    assert(deny.accepts("http://anything.example.com/"))
    // the allowlist's NUTCH-2189 short-circuit fires before URL parsing
    // (reference returns the url untouched); the denylist has no such
    // short-circuit and rejects what it cannot parse
    assert(allow.accepts("not a url"))
    assert(!deny.accepts("not a url"))
    // with rules present, junk rejects on both engines
    assert(!DomainUrlFilter.parse(Iterator("net")).accepts("not a url"))
    assert(!DomainUrlFilter.parse(Iterator("net"), deny = true)
      .accepts("not a url"))
  }
}
