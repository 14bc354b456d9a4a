package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Conformance tables ported from the reference's TestURLUtil.java
  * (testGetDomainName / testGetDomainSuffix) — the reference delegates
  * to crawler-commons EffectiveTldFinder over the ICANN PSL, non-strict
  * mode. Plus the PSL wildcard/exception algorithm cases and a codegen
  * smoke over the Column path. */
class PslSpec extends AnyFunSuite with SparkSuite {

  // (host, expected registrable domain) — TestURLUtil.testGetDomainName
  private val domainTable = Seq(
    "lucene.apache.org" -> "apache.org",
    "lucene.apache.org." -> "apache.org", // trailing dot
    "en.wikipedia.org" -> "wikipedia.org",
    "140.211.11.130" -> "140.211.11.130", // IP: returned whole
    "www.example.co.uk:8080" -> "example.co.uk", // port stripped
    "com" -> "com", // host IS a suffix
    "www.example.co.uk.com" -> "uk.com", // ICANN-only: uk.com is private
    "example.com.nn" -> "example.com.nn", // nn is no suffix → whole host
    "www.edu.tr.xyz" -> "tr.xyz", // xyz is an ICANN gTLD
    "www.example.c.se" -> "example.c.se", // c.se is listed
    "www.example.plc.co.im" -> "example.plc.co.im", // 3-label suffix
    "www.example.2000.hu" -> "example.2000.hu", // numeric-label suffix
    "www.example.flå.no" -> "example.flå.no", // IDN suffix (unicode in)
    "www.example.栃木.jp" -> "example.栃木.jp", // IDN suffix (CJK)
    "UPPER.Example.COM" -> "example.com" // lowercased
  )

  // (host, expected suffix or null) — TestURLUtil.testGetDomainSuffix
  private val suffixTable = Seq(
    "lucene.apache.org" -> "org",
    "lucene.apache.org." -> "org",
    "140.211.11.130" -> null,
    "www.example.co.uk:8080" -> "co.uk",
    "com" -> "com",
    "www.example.plc.co.im" -> "plc.co.im",
    "www.example.2000.hu" -> "2000.hu",
    "example.com.nn" -> null
  )

  test("registrable domain matches the TestURLUtil table") {
    for ((host, want) <- domainTable)
      assert(Psl.assignedDomain(host) == want, s"host=$host")
  }

  test("domain suffix matches the TestURLUtil table") {
    for ((host, want) <- suffixTable)
      assert(Psl.domainSuffix(host) == want, s"host=$host")
  }

  test("wildcard and exception rules (PSL algorithm)") {
    // *.ck: every label under ck is a suffix …
    assert(Psl.assignedDomain("foo.bar.ck") == "foo.bar.ck")
    assert(Psl.domainSuffix("foo.bar.ck") == "bar.ck")
    assert(Psl.assignedDomain("bar.ck") == "bar.ck") // host IS a suffix
    // … except !www.ck, which is itself registrable
    assert(Psl.assignedDomain("www.ck") == "www.ck")
    assert(Psl.assignedDomain("foo.www.ck") == "www.ck")
    assert(Psl.domainSuffix("www.ck") == "ck")
    // Japanese city exceptions: !city.kawasaki.jp under *.kawasaki.jp
    assert(Psl.assignedDomain("foo.city.kawasaki.jp") == "city.kawasaki.jp")
    assert(Psl.assignedDomain("a.b.kawasaki.jp") == "a.b.kawasaki.jp")
  }

  test("chooseRepr matches the TestURLUtil table") {
    import Urls.chooseRepr
    val aDotCom = "http://www.a.com"
    val bDotCom = "http://www.b.com"
    val aSubDotCom = "http://www.news.a.com"
    val aQStr = "http://www.a.com?y=1"
    val aPath = "http://www.a.com/xyz/index.html"
    val aPath2 = "http://www.a.com/abc/page.html"
    val aPath3 = "http://www.news.a.com/abc/page.html"
    // 1) different domain: keep dest, temp or perm
    assert(chooseRepr(aDotCom, bDotCom, temp = true) == bDotCom)
    assert(chooseRepr(aDotCom, bDotCom, temp = false) == bDotCom)
    // 2) permanent and root: keep src
    assert(chooseRepr(aDotCom, aQStr, temp = false) == aDotCom)
    assert(chooseRepr(aDotCom, aPath, temp = false) == aDotCom)
    // 3) permanent, src not root, dest root: keep dest
    assert(chooseRepr(aPath, aDotCom, temp = false) == aDotCom)
    // 4) permanent and neither root: keep dest
    assert(chooseRepr(aPath, aPath2, temp = false) == aPath2)
    // 5) temp, src root, dest not: keep src
    assert(chooseRepr(aDotCom, aPath, temp = true) == aDotCom)
    // 6) temp, src not root, dest root: keep dest
    assert(chooseRepr(aPath, aDotCom, temp = true) == aDotCom)
    // 7) temp, neither root: shortest path / shallowest host
    assert(chooseRepr(aPath, aPath2, temp = true) == aPath2)
    assert(chooseRepr(aPath, aPath3, temp = true) == aPath)
    // 8) temp, both root: shortest subdomain
    assert(chooseRepr(aDotCom, aSubDotCom, temp = true) == aDotCom)
    // malformed: keep dest
    assert(chooseRepr("nonsense", aDotCom, temp = true) == aDotCom)
  }

  test("null/empty/userinfo edge cases") {
    assert(Psl.assignedDomain(null) == null)
    assert(Psl.assignedDomain("") == "")
    assert(Psl.assignedDomain("user:pw@www.example.com:443") == "example.com")
    assert(Psl.domainSuffix("") == null)
  }

  test("Column path (StaticInvoke) computes inside a Spark plan") {
    import spark.implicits._
    val df = Seq(
      "https://lucene.apache.org/nutch",
      "http://www.example.co.uk:8080/index.html",
      "http://example.com.nn/x",
      "http://foo.bar.ck/x"
    ).toDF("url")
      .select(Urls.registeredDomain(col("url")).as("domain"),
        Urls.domainSuffix(col("url")).as("suffix"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows(0) == ("apache.org", "org"))
    assert(rows(1) == ("example.co.uk", "co.uk"))
    assert(rows(2) == ("example.com.nn", null))
    assert(rows(3) == ("foo.bar.ck", "bar.ck"))
    // the call sits inside the plan as a static invoke, not a UDF
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("static_invoke") || plan.contains("StaticInvoke")
      || !plan.contains("BatchEvalPython"), plan)
  }
}
