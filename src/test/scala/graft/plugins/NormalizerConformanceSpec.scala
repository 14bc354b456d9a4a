package graft.plugins

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.plugins.Normalizers._

/** Conformance suites for the URL-normalizer engine family.
  *
  * The regex engine runs the reference's own sample rule files and
  * url→expected tables verbatim (urlnormalizer-regex/sample/
  * regex-normalize-{default,scope1}.{xml,test}); the slash/host/protocol
  * engines run the reference's data files plus their JUnit expectation
  * tables (TestSlashURLNormalizer.java:34-93,
  * TestHostURLNormalizer.java:33-60, TestProtocolURLNormalizer.java:34-98);
  * querystring and ajax run their JUnit tables
  * (TestQuerystringURLNormalizer.java:31-50,
  * TestAjaxURLNormalizer.java:38-56).
  */
class NormalizerConformanceSpec extends AnyFunSuite {

  private val sampleDir = "/root/reference/src/plugin"
  private val default = Extensions.Scope.Default

  private def read(path: String): String =
    new String(Files.readAllBytes(Paths.get(path)), "UTF-8")

  // --- regex engine: reference sample rule files + .test tables ---

  for (scope <- Seq("default", "scope1")) {
    test(s"urlnormalizer-regex sample conformance: $scope") {
      val base = s"$sampleDir/urlnormalizer-regex/sample/regex-normalize-$scope"
      assume(Files.exists(Paths.get(s"$base.xml")))
      val rules = RegexUrlNormalizer.parseRules(read(s"$base.xml"))
      assert(rules.nonEmpty)
      val n = new RegexUrlNormalizer(Nil, Map(scope -> rules))
      Files.readAllLines(Paths.get(s"$base.test")).asScala
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
        .foreach { line =>
          val parts = line.split("\\s+")
          assert(n.normalize(parts(0), scope).contains(parts(1)),
            s"$scope: ${parts(0)} -> expected ${parts(1)}, " +
              s"got ${n.normalize(parts(0), scope)}")
        }
    }
  }

  test("regex engine: scope fallback to default rules") {
    val rules = RegexUrlNormalizer.parseRules(
      """<regex-normalize><regex>
        |<pattern>#.*</pattern><substitution></substitution>
        |</regex></regex-normalize>""".stripMargin)
    val n = new RegexUrlNormalizer(rules, Map.empty)
    // any scope without its own rules uses the default set
    assert(n.normalize("http://a.com/x#f", "crawldb")
      .contains("http://a.com/x"))
  }

  test("regex engine: invalid pattern rules are skipped") {
    val rules = RegexUrlNormalizer.parseRules(
      """<regex-normalize>
        |<regex><pattern>[unclosed</pattern><substitution>x</substitution></regex>
        |<regex><pattern>b</pattern><substitution>c</substitution></regex>
        |</regex-normalize>""".stripMargin)
    assert(rules.size == 1)
  }

  // --- querystring engine (TestQuerystringURLNormalizer.java:31-50) ---

  test("urlnormalizer-querystring conformance") {
    val n = new QuerystringUrlNormalizer
    val cases = Seq(
      "http://example.com/?c=d&a=b" -> "http://example.com/?a=b&c=d",
      "http://example.com/a/b/c" -> "http://example.com/a/b/c",
      "http://example.com:1234/a/b/c" -> "http://example.com:1234/a/b/c",
      "http://example.com:1234/a/b/c#ref" -> "http://example.com:1234/a/b/c#ref",
      "http://example.com:1234/a/b/c?c=d&a=b#ref" ->
        "http://example.com:1234/a/b/c?a=b&c=d#ref",
      "http://example.com/?c=d&a=b&a=c" -> "http://example.com/?a=b&a=c&c=d")
    cases.foreach { case (in, out) =>
      assert(n.normalize(in, default).contains(out), s"querystring: $in")
    }
  }

  // --- slash engine (data/slashes.txt + TestSlashURLNormalizer.java) ---

  test("urlnormalizer-slash conformance") {
    val dataFile = s"$sampleDir/urlnormalizer-slash/data/slashes.txt"
    assume(Files.exists(Paths.get(dataFile)))
    val n = new SlashUrlNormalizer(SlashUrlNormalizer.parseRules(read(dataFile)))
    val cases = Seq(
      // no rule for these hosts -> untouched, roots never touched
      "http://example.org/" -> "http://example.org/",
      "http://example.net" -> "http://example.net",
      "http://example.org/buh/" -> "http://example.org/buh/",
      "http://example.net/blaat" -> "http://example.net/blaat",
      // www.example.org + : add slash
      "http://www.example.org/page" -> "http://www.example.org/page/",
      "http://www.example.org/page?a=b&c=d" ->
        "http://www.example.org/page/?a=b&c=d",
      // www.example.net - : remove slash
      "http://www.example.net/path/to/something/" ->
        "http://www.example.net/path/to/something",
      "http://www.example.net/path/to/something/?a=b&c=d" ->
        "http://www.example.net/path/to/something?a=b&c=d",
      // extension heuristic: file-like paths are not slashed
      "http://www.example.org/noise.mp3" -> "http://www.example.org/noise.mp3",
      "http://www.example.org/page.html" -> "http://www.example.org/page.html",
      "http://www.example.org/page.shtml" -> "http://www.example.org/page.shtml",
      "http://www.example.org/this.is.not.an_extension" ->
        "http://www.example.org/this.is.not.an_extension/")
    cases.foreach { case (in, out) =>
      assert(n.normalize(in, default).contains(out), s"slash: $in")
    }
  }

  // --- host engine (data/hosts.txt + TestHostURLNormalizer.java) ---

  test("urlnormalizer-host conformance") {
    val dataFile = s"$sampleDir/urlnormalizer-host/data/hosts.txt"
    assume(Files.exists(Paths.get(dataFile)))
    val n = new HostUrlNormalizer(HostUrlNormalizer.parseRules(read(dataFile)))
    val cases = Seq(
      "http://example.org/page.html" -> "http://www.example.org/page.html",
      "http://www.example.net/path/to/something.html" ->
        "http://example.net/path/to/something.html",
      "http://example.com/?does=it&still=work" ->
        "http://example.com/?does=it&still=work",
      "http://http.www.example.com/buh" -> "http://example.com/buh",
      "http://whatever.example.com/blaat" -> "http://example.com/blaat")
    cases.foreach { case (in, out) =>
      assert(n.normalize(in, default).contains(out), s"host: $in")
    }
  }

  // --- protocol engine (data/protocols.txt + TestProtocolURLNormalizer.java) ---

  test("urlnormalizer-protocol conformance") {
    val dataFile = s"$sampleDir/urlnormalizer-protocol/data/protocols.txt"
    assume(Files.exists(Paths.get(dataFile)))
    val (hosts, domains) = ProtocolUrlNormalizer.parseRules(read(dataFile))
    val n = new ProtocolUrlNormalizer(hosts, domains)
    val cases = Seq(
      // https -> http
      "https://example.org/" -> "http://example.org/",
      "https://example.net/" -> "http://example.net/",
      // http -> https
      "http://example.io/" -> "https://example.io/",
      "http://example.nl/" -> "https://example.nl/",
      "https://example.io/" -> "https://example.io/",
      "http://example.io/path?q=uery" -> "https://example.io/path?q=uery",
      // explicit ports: untouched
      "http://example.io:8080/path?q=uery" -> "http://example.io:8080/path?q=uery",
      "https://example.org:8443/path" -> "https://example.org:8443/path",
      // *.example.com wildcard incl. bare domain
      "http://example.com/" -> "https://example.com/",
      "http://www.example.com/" -> "https://www.example.com/",
      "http://www.subdomain.example.com/" -> "https://www.subdomain.example.com/",
      "http://myexample.com/" -> "http://myexample.com/",
      // invalid rules skipped
      "http://invalid-rule1.example.top/" -> "http://invalid-rule1.example.top/",
      "http://invalid-rule2.example.top/" -> "http://invalid-rule2.example.top/",
      "http://invalid-rule3.example.top/" -> "http://invalid-rule3.example.top/")
    cases.foreach { case (in, out) =>
      assert(n.normalize(in, default).contains(out), s"protocol: $in")
    }
  }

  // --- ajax engine (TestAjaxURLNormalizer.java:38-56) ---

  test("urlnormalizer-ajax conformance") {
    val n = new AjaxUrlNormalizer
    // crawl scopes: #! -> _escaped_fragment_
    val forward = Seq(
      "http://example.org/#!k=v" -> "http://example.org/?_escaped_fragment_=k=v",
      "http://example.org/#!k=v&something=is wrong" ->
        "http://example.org/?_escaped_fragment_=k=v%26something=is%20wrong",
      "http://example.org/path.html?queryparam=queryvalue#!key1=value1&key2=value2" ->
        "http://example.org/path.html?queryparam=queryvalue&_escaped_fragment_=key1=value1%26key2=value2")
    forward.foreach { case (in, out) =>
      assert(n.normalize(in, default).contains(out), s"ajax fwd: $in")
    }
    // indexer scope: _escaped_fragment_ -> #!
    val back = Seq(
      "http://example.org/?_escaped_fragment_=key=value" ->
        "http://example.org/#!key=value",
      "http://example.org/?key=value&_escaped_fragment_=key=value" ->
        "http://example.org/?key=value#!key=value",
      "http://example.org/page.html?key=value&_escaped_fragment_=key=value%26something=is%20wrong" ->
        "http://example.org/page.html?key=value#!key=value&something=is wrong")
    back.foreach { case (in, out) =>
      assert(n.normalize(in, Extensions.Scope.Indexer).contains(out),
        s"ajax back: $in")
    }
  }

  // --- chain through the registry: per-scope engines compose ---

  test("multi-engine chain composes through Registry scopes") {
    val regex = new RegexUrlNormalizer(RegexUrlNormalizer.parseRules(
      """<regex-normalize><regex>
        |<pattern>(?i)(;?\b_?(l|j|bv_)?(sid|phpsessid|sessionid)=.*?)(\?|&amp;|#|$)</pattern>
        |<substitution>$4</substitution>
        |</regex></regex-normalize>""".stripMargin))
    val qs = new QuerystringUrlNormalizer
    val host = new HostUrlNormalizer(Map("example.org" -> "www.example.org"))
    val proto = new ProtocolUrlNormalizer(Map("www.example.org" -> "https"),
      Map.empty)
    val reg = Extensions.Registry(
      normalizers = Seq(regex, qs, host, proto))
    // session id stripped, params sorted, host remapped, scheme forced
    assert(reg.normalize(
      "http://example.org/x;jsessionid=ABC?b=2&a=1", Extensions.Scope.Crawldb)
      .contains("https://www.example.org/x?a=1&b=2"))
  }
}
