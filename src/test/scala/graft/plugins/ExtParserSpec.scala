package graft.plugins

import org.scalatest.funsuite.AnyFunSuite

import graft.schemas.ParseStatusCodes

/** parse-ext analog against real processes (TestExtParser.java shape):
  * stdin → command → stdout text, failure on nonzero exit, kill on
  * timeout, fallback to the HTML tokenizer for unbound types. */
class ExtParserSpec extends AnyFunSuite {

  private val payload = "external parser payload\n".getBytes("UTF-8")

  test("command sees the payload on stdin (reference stdin contract)") {
    // sh -c 'cat -' ignores the appended content-type argument ($0)
    val p = new ExtParser(Map(
      "application/x-ext-test" -> ExtCommand(Seq("sh", "-c", "cat -"))))
    val (st, _, text, _) = p.parse("http://x/", "http://x/", payload,
      "application/x-ext-test")
    assert(st == ParseStatusCodes.Success)
    assert(text == "external parser payload\n")
  }

  test("the content type rides as the final argument") {
    val p = new ExtParser(Map(
      "application/x-ext-test" -> ExtCommand(Seq("sh", "-c", "echo $0"))))
    val (st, _, text, _) = p.parse("http://x/", "http://x/", payload,
      "application/x-ext-test")
    assert(st == ParseStatusCodes.Success)
    assert(text.trim == "application/x-ext-test")
  }

  test("nonzero exit is a parse failure") {
    val p = new ExtParser(Map(
      "application/x-ext-test" -> ExtCommand(Seq("sh", "-c", "exit 3"))))
    val (st, _, text, _) = p.parse("http://x/", "http://x/", payload,
      "application/x-ext-test")
    assert(st == ParseStatusCodes.Failed)
    assert(text.isEmpty)
  }

  test("a hung command is killed at the timeout, not waited on forever") {
    val p = new ExtParser(Map(
      "application/x-ext-test" ->
        ExtCommand(Seq("sh", "-c", "sleep 60"), timeoutSec = 1)))
    val t0 = System.nanoTime()
    val (st, _, _, _) = p.parse("http://x/", "http://x/", payload,
      "application/x-ext-test")
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    assert(st == ParseStatusCodes.Failed)
    assert(elapsedSec < 10, s"took $elapsedSec s")
  }

  test("unbound content types fall through to the HTML tokenizer") {
    val p = new ExtParser(Map.empty)
    val html = "<html><title>T</title><body>hi</body></html>"
      .getBytes("UTF-8")
    val (st, title, text, _) = p.parse("http://x/", "http://x/", html,
      "text/html")
    assert(st == ParseStatusCodes.Success)
    assert(title == "T")
    assert(text.contains("hi"))
  }

  test("a missing executable fails the parse, not the job") {
    val p = new ExtParser(Map(
      "application/x-ext-test" ->
        ExtCommand(Seq("/no/such/binary-xyz"))))
    val (st, _, _, _) = p.parse("http://x/", "http://x/", payload,
      "application/x-ext-test")
    assert(st == ParseStatusCodes.Failed)
  }
}
