package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class HttpDatesSpec extends AnyFunSuite {

  private val t = 784111777000L // Sun, 06 Nov 1994 08:49:37 GMT

  test("IMF-fixdate round trip") {
    assert(HttpDates.toHttpString(t) == "Sun, 06 Nov 1994 08:49:37 GMT")
    assert(HttpDates.parse("Sun, 06 Nov 1994 08:49:37 GMT").contains(t))
  }

  test("lenient parse: single-digit day, other zones") {
    assert(HttpDates.parse("Sun, 6 Nov 1994 08:49:37 GMT").contains(t))
    assert(HttpDates.parse("Sun, 06 Nov 1994 08:49:37 UTC").contains(t))
  }

  test("obsolete RFC 850 and asctime forms") {
    assert(HttpDates.parse("Sunday, 06-Nov-94 08:49:37 GMT").contains(t))
    assert(HttpDates.parse("Sun Nov  6 08:49:37 1994").contains(t))
  }

  test("garbage yields None") {
    assert(HttpDates.parse("not a date").isEmpty)
    assert(HttpDates.parse("").isEmpty)
    assert(HttpDates.parse(null).isEmpty)
  }
}
