package graft.net

import org.scalatest.funsuite.AnyFunSuite

class JexlSpec extends AnyFunSuite {

  test("comparison and logical operators") {
    assert(Jexl.toSqlExpr("score > 1.0 && status == 'db_fetched'") ==
      "score > 1.0 AND status = 'db_fetched'")
    assert(Jexl.toSqlExpr("a != 2 || !(b < 3)") ==
      "a != 2 OR NOT (b < 3)")
    assert(Jexl.toSqlExpr("retries >= 1 && retries <= 3") ==
      "retries >= 1 AND retries <= 3")
  }

  test("string literals are protected") {
    assert(Jexl.toSqlExpr("name == 'a && b'") == "name = 'a && b'")
    assert(Jexl.toSqlExpr("name == \"x == y\"") == "name = 'x == y'")
  }

  test("membership operators") {
    assert(Jexl.toSqlExpr("status =~ ('a','b')") == "status IN ('a','b')")
    assert(Jexl.toSqlExpr("status !~ ('a')") == "status NOT IN ('a')")
  }

  test("arithmetic and grouping pass through") {
    assert(Jexl.toSqlExpr("(score * 2 + 1) > fetchTime % 10") ==
      "(score * 2 + 1) > fetchTime % 10")
  }
}
