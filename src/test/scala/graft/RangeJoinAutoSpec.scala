package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** rangeJoinAuto (r12 verdict Next #5): the grid is derived from the
  * band-width distribution instead of being a caller obligation —
  * the probe showed a misfit G fails SILENTLY (within-cell quadratic
  * CPU, invisible to shuffle metrics). The answer must be invariant
  * to G (the exact re-check guarantees it); these cases pin the
  * derivation's bounds and that invariance. */
class RangeJoinAutoSpec extends AnyFunSuite with SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def fixtureBands = Tables(spark, dir, "part").select(
    col("p_partkey").as("band_id"),
    ((col("p_partkey") * 9973) % 100000).as("lo"),
    ((col("p_partkey") * 9973) % 100000 + 100 +
      (col("p_partkey") % 13) * 300).as("hi"))

  private def fixtureProbe = Tables(spark, dir, "orders").select(
    col("o_orderkey"), (col("o_orderkey") % 100000).as("v"))

  test("derived grid is a quarter of the typical band width (r15: " +
    "the waste term of the cell join is linear in G, so G rides the " +
    "p50/4 scale, not the p99 width)") {
    // fixture widths are 100 + 300k, k in 0..12: p50 = 1900 →
    // G = ceil(1900/4) = 475, far above the maxWidth/64 floor (58)
    val g = QueriesCore.rangeJoinGrid(fixtureBands)
    assert(g == 475L, s"g=$g")
  }

  test("auto result is identical to any valid fixed-G result") {
    val auto = QueriesCore.rangeJoinAuto(fixtureBands, fixtureProbe)
      .orderBy("band_id").collect().toSeq
    val fixed = QueriesCore.rangeJoinOn(fixtureBands, fixtureProbe, 4096L)
      .orderBy("band_id").collect().toSeq
    assert(auto.nonEmpty && auto == fixed)
  }

  test("one pathological band cannot inflate the grid into the " +
    "quadratic regime (p99, floored at maxWidth/64)") {
    import spark.implicits._
    val bands = ((1L to 999L).map(i => (i, i * 200L, i * 200L + 8L)) :+
      (1000L, 0L, 100000L)).toDF("band_id", "lo", "hi")
    val g = QueriesCore.rangeJoinGrid(bands)
    // p99 of widths is 8; the 100000-wide outlier only lifts G through
    // the /64 explosion floor — never to its own width
    assert(g == (100000L + 63) / 64, s"g=$g")
    // and the outlier explodes to at most 65 cells, not thousands
    assert(g * 65 >= 100000L)
    // answer parity with a comfortably-large fixed grid
    val probe = (0L until 3000L).map(i => (i, (i * 37L) % 200500L))
      .toDF("o_orderkey", "v")
    val auto = QueriesCore.rangeJoinAuto(bands, probe)
      .orderBy("band_id").collect().toSeq
    val fixed = QueriesCore.rangeJoinOn(bands, probe, 131072L)
      .orderBy("band_id").collect().toSeq
    assert(auto.nonEmpty && auto == fixed)
  }

  test("degenerate inputs: empty bands derive G=1 and join to empty") {
    import spark.implicits._
    val bands = Seq.empty[(Long, Long, Long)].toDF("band_id", "lo", "hi")
    assert(QueriesCore.rangeJoinGrid(bands) == 1L)
    val probe = Seq((1L, 5L)).toDF("o_orderkey", "v")
    assert(QueriesCore.rangeJoinAuto(bands, probe).isEmpty)
  }

  test("an inverted interval (hi <= lo) matches nothing and never " +
    "explodes a descending cell sequence") {
    import spark.implicits._
    // sequence() auto-steps downward on inverted bounds, so without
    // the hi > lo pre-filter the (lo=10^9, hi=0) band would explode
    // to ~10^9/G cells before the re-check discarded them all
    val bands = Seq((1L, 10L, 20L), (2L, 1000000000L, 0L), (3L, 7L, 7L))
      .toDF("band_id", "lo", "hi")
    val probe = (0L until 50L).map(i => (i, i)).toDF("o_orderkey", "v")
    val got = QueriesCore.rangeJoinOn(bands, probe, 8L)
      .orderBy("band_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 10L))) // only the real band, its 10 probes
  }

  test("int-typed axes: grid() casts widths to long inside the " +
    "aggregate (approx_percentile/max return the INPUT type) and " +
    "inverted intervals are excluded from the width distribution") {
    import spark.implicits._
    // int lo/hi — the r13 getLong would ClassCastException here
    val bands = Seq((1L, 10, 20), (2L, 100, 300), (3L, 500, 400))
      .toDF("band_id", "lo", "hi")
    val g = graft.ops.RangeJoin.grid(bands, "lo", "hi")
    // widths {10, 200}; the inverted (500,400) band contributes
    // nothing (pre-r14 its -100 width skewed the quantile downward).
    // p50 = 10 → ceil(10/4) = 3, lifted by the ceil(200/64) = 4
    // explosion floor
    assert(g == 4L, s"g=$g")
    val probe = Seq((7L, 15), (8L, 250), (9L, 450))
      .toDF("o_orderkey", "v")
    val got = graft.ops.RangeJoin.join(bands, probe, "lo", "hi", "v")
      .orderBy("band_id")
      .collect().map(r => (r.getAs[Long]("band_id"),
        r.getAs[Long]("o_orderkey"))).toSeq
    assert(got == Seq((1L, 7L), (2L, 8L)))
  }
}
