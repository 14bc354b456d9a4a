package graft.net

import org.scalatest.funsuite.AnyFunSuite

class RobotsSpec extends AnyFunSuite {

  private val txt =
    """# sample robots
      |User-agent: *
      |Disallow: /private/
      |Disallow: /tmp
      |Allow: /private/ok
      |Crawl-delay: 2.5
      |
      |User-agent: graft
      |Disallow: /graft-only/
      |Allow: /
      |
      |User-agent: evilbot
      |Disallow: /
      |""".stripMargin

  test("group selection by agent, * fallback") {
    val g = Robots.parse(txt, "graft/1.0")
    assert(g.isAllowed("/private/secret")) // graft group allows everything
    assert(!g.isAllowed("/graft-only/x"))
    val any = Robots.parse(txt, "someone-else")
    assert(!any.isAllowed("/private/secret"))
    assert(!any.isAllowed("/tmp/file"))
    assert(any.isAllowed("/public"))
    val evil = Robots.parse(txt, "EvilBot")
    assert(!evil.isAllowed("/anything"))
  }

  test("longest-match precedence: Allow wins over shorter Disallow") {
    val any = Robots.parse(txt, "x")
    assert(any.isAllowed("/private/ok/page"))
    assert(!any.isAllowed("/private/other"))
  }

  test("wildcards and anchors") {
    val r = Robots.parse(
      "User-agent: *\nDisallow: /*.gif$\nDisallow: /a/*/c\n", "x")
    assert(!r.isAllowed("/img/x.gif"))
    assert(r.isAllowed("/img/x.gif.html")) // $ anchor
    assert(!r.isAllowed("/a/b/c"))
    assert(r.isAllowed("/a/b/d"))
  }

  test("crawl delay and empty/missing files") {
    assert(Robots.parse(txt, "zzz").crawlDelayMs.contains(2500L))
    assert(Robots.parse("", "x").isAllowed("/anything"))
    assert(Robots.AllowAll.isAllowed("/"))
  }
}
