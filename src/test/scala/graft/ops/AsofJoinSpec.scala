package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** The public AS-OF operator beyond the board fixture: multi-key
  * grouping, non-strict matching, multi-column payloads, and the
  * determinism contract under right-side ts collisions. (The planted
  * hot-key A/B and the board-oracle parity live in AsofSkewSpec /
  * the asof_join query.) */
class AsofJoinSpec extends AnyFunSuite with SparkSuite {

  private def quotes = {
    import spark.implicits._
    Seq(
      // (exchange, symbol, ts, bid, ask)
      ("N", "A", 10L, 100L, 101L),
      ("N", "A", 20L, 102L, 103L),
      ("N", "B", 15L, 50L, 51L),
      ("Q", "A", 12L, 99L, 100L), // same symbol, other exchange
      // two quotes at the SAME (key, ts): the payload-struct max
      // (bid DESC lexicographically) must win deterministically
      ("N", "C", 10L, 7L, 9L),
      ("N", "C", 10L, 8L, 9L)
    ).toDF("exch", "sym", "qts", "bid", "ask")
  }

  private def trades = {
    import spark.implicits._
    Seq(
      // (exchange, symbol, ts, size)
      ("N", "A", 25L, 1L),  // after both N/A quotes -> ts 20
      ("N", "A", 20L, 2L),  // ties a quote: strict -> ts 10
      ("N", "A", 5L, 3L),   // before any quote -> null
      ("N", "B", 16L, 4L),  // -> ts 15
      ("Q", "A", 30L, 5L),  // other exchange -> its own quote at 12
      ("N", "C", 11L, 6L)   // collision pair -> the (8, 9) quote
    ).toDF("exch", "sym", "tts", "size")
  }

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.select("size", "bid", "ask", "qts_asof").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet

  test("multi-key strict as-of: latest strictly-prior quote per " +
    "(exchange, symbol), deterministic under quote-ts collisions") {
    val got = collect(AsofJoin(trades, quotes, Seq("exch", "sym"),
      "tts", "qts"))
    assert(got == Set(
      (1L, 102L, 103L, 20L),
      (2L, 100L, 101L, 10L), // tie is NOT prior under strict
      (3L, -1L, -1L, -1L),   // nothing prior
      (4L, 50L, 51L, 15L),
      (5L, 99L, 100L, 12L),  // keyed off its own exchange
      (6L, 8L, 9L, 10L)))    // max payload struct at the collision
  }

  test("non-strict as-of admits the equal-ts right row") {
    val got = collect(AsofJoin(trades, quotes, Seq("exch", "sym"),
      "tts", "qts", strict = false))
    // only the tie row changes: ts 20 now matches its own-ts quote
    assert(got.contains((2L, 102L, 103L, 20L)))
    assert(got.contains((1L, 102L, 103L, 20L)))
    assert(got.contains((3L, -1L, -1L, -1L)))
  }

  test("window and two-phase carries are row-identical here too") {
    val a = collect(AsofJoin.enrich(trades, quotes, Seq("exch", "sym"),
      "tts", "qts", strict = true, twoPhase = true))
    val b = collect(AsofJoin.enrich(trades, quotes, Seq("exch", "sym"),
      "tts", "qts", strict = true, twoPhase = false))
    assert(a == b && a.nonEmpty)
  }

  test("name-collision and empty-payload contracts fail loudly") {
    import spark.implicits._
    val l = Seq((1L, 2L)).toDF("k", "ts")
    val rNoPayload = Seq((1L, 1L)).toDF("k", "ts")
    intercept[IllegalArgumentException] {
      AsofJoin(l, rNoPayload, Seq("k"), "ts", "ts")
    }
    val lClash = Seq((1L, 2L, 0L)).toDF("k", "ts", "p")
    val r = Seq((1L, 1L, 9L)).toDF("k", "ts", "p")
    intercept[IllegalArgumentException] {
      AsofJoin(lClash, r, Seq("k"), "ts", "ts")
    }
  }
}
