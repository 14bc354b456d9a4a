package graft.functions

import java.util.Arrays

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** MergingTDigest: accuracy vs exact quantiles, the O(δ) state bound,
  * merge/partition invariance, byte-roundtrip determinism, and the
  * Spark aggregate + stored-sketch paths. All sample streams come from
  * a fixed LCG (no Math.random — deterministic under re-run). */
class TDigestSpec extends AnyFunSuite with SparkSuite {

  /** Numerical Recipes LCG — deterministic, good enough for shapes. */
  private def lcgStream(seed: Long, n: Int): Array[Double] = {
    var s = seed
    Array.fill(n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 11).toDouble / (1L << 53).toDouble)
    }
  }

  /** True rank of value v in sorted data, as a quantile in [0,1]. */
  private def rankOf(sorted: Array[Double], v: Double): Double = {
    var lo = 0
    var hi = sorted.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (sorted(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo.toDouble / sorted.length
  }

  private val qs = Seq(0.001, 0.01, 0.25, 0.5, 0.75, 0.99, 0.999)
  /** Rank-error budgets. k1 spends resolution at the tails, so tail
    * bounds are ~25× tighter than the middle — on data whose values
    * are locally near-linear in rank (uniform). Value-space
    * interpolation inside a cluster can err by up to ~the cluster's
    * own rank-mass when the value↔rank map is violently nonlinear
    * (x^8: the q=0.001 neighborhood spans 5 decades of value), so the
    * heavy-shape budget is the local ideal-cluster mass — the same
    * envelope the reference library's estimator has at this n/δ. */
  private val tight =
    Map(0.001 -> 8e-4, 0.01 -> 2e-3, 0.25 -> 0.02, 0.5 -> 0.02,
        0.75 -> 0.02, 0.99 -> 2e-3, 0.999 -> 8e-4)
  private val loose =
    Map(0.001 -> 5e-3, 0.01 -> 9e-3, 0.25 -> 0.03, 0.5 -> 0.03,
        0.75 -> 0.03, 0.99 -> 9e-3, 0.999 -> 5e-3)

  private def assertAccurate(d: MergingTDigest, sorted: Array[Double],
      budget: Map[Double, Double] = tight, scale: Double = 1.0): Unit =
    qs.foreach { q =>
      val est = d.quantile(q)
      val err = math.abs(rankOf(sorted, est) - q)
      assert(err <= budget(q) * scale,
        s"q=$q est=$est rank=${rankOf(sorted, est)} err=$err")
    }

  test("endpoints are exact; empty digest yields NaN; weight conserved") {
    val d = new MergingTDigest(100)
    assert(d.quantile(0.5).isNaN)
    val xs = lcgStream(7, 10001).map(x => x * 100 - 50)
    xs.foreach(d.add(_))
    assert(d.totalWeight == 10001.0)
    assert(d.quantile(0.0) == xs.min)
    assert(d.quantile(1.0) == xs.max)
    assert(d.min == xs.min && d.max == xs.max)
  }

  test("accuracy on uniform and heavy-tail streams (100k, δ=100)") {
    for ((seed, shape) <- Seq((1L, "uniform"), (2L, "heavy"))) {
      val raw = lcgStream(seed, 100000)
      val xs = if (shape == "uniform") raw
               else raw.map(x => math.pow(x, 8) * 1e6) // long right tail
      val d = new MergingTDigest(100)
      xs.foreach(d.add(_))
      val sorted = xs.sorted
      withClue(shape)(
        assertAccurate(d, sorted, if (shape == "heavy") loose else tight))
    }
  }

  test("centroid count stays O(δ) through a 100k stream and merges") {
    val d = new MergingTDigest(100)
    lcgStream(3, 100000).foreach(d.add(_))
    assert(d.centroidCount <= 208, s"centroids=${d.centroidCount}")
    // merging 64 digests of pre-fattened centroids must also hold it
    val m = new MergingTDigest(100)
    (0 until 64).foreach { i =>
      val part = new MergingTDigest(100)
      lcgStream(100 + i, 2000).foreach(part.add(_))
      m.merge(part)
    }
    assert(m.centroidCount <= 208, s"merged centroids=${m.centroidCount}")
    assert(m.totalWeight == 64 * 2000.0)
  }

  test("partitioned merge matches whole-stream accuracy (37 parts)") {
    val xs = lcgStream(4, 100000)
    val parts = xs.grouped(math.ceil(xs.length / 37.0).toInt).toSeq
    val merged = new MergingTDigest(100)
    parts.foreach { p =>
      val d = new MergingTDigest(100)
      p.foreach(d.add(_))
      merged.merge(d)
    }
    assertAccurate(merged, xs.sorted, scale = 2.0)
    assert(merged.centroidCount <= 208)
    assert(merged.quantile(0.0) == xs.min && merged.quantile(1.0) == xs.max)
  }

  test("byte roundtrip is exact and re-serializes byte-equal") {
    val d = new MergingTDigest(100)
    lcgStream(5, 50000).foreach(d.add(_))
    val bytes = d.toBytes
    val back = MergingTDigest.fromBytes(bytes)
    assert(Arrays.equals(back.toBytes, bytes))
    qs.foreach(q => assert(back.quantile(q) == d.quantile(q)))
    assert(back.min == d.min && back.max == d.max)
    assert(back.totalWeight == d.totalWeight)
  }

  test("weighted adds equal repeated adds") {
    val a = new MergingTDigest(100)
    val b = new MergingTDigest(100)
    val xs = lcgStream(6, 500).map(x => math.rint(x * 20)) // 21 values
    xs.foreach(a.add(_))
    xs.groupBy(identity).foreach { case (v, g) => b.add(v, g.length) }
    qs.foreach { q =>
      assert(math.abs(a.quantile(q) - b.quantile(q)) <= 1.0,
        s"q=$q a=${a.quantile(q)} b=${b.quantile(q)}")
    }
    assert(a.totalWeight == b.totalWeight)
  }

  test("Spark aggregate: grouped quantiles within budget; empty → null") {
    val s = spark
    import s.implicits._
    val xs = lcgStream(8, 40000)
    val df = xs.zipWithIndex.toSeq
      .map { case (x, i) => (i % 4, x) }.toDF("g", "x")
      .repartition(8)
    val out = df.groupBy("g")
      .agg(TDigest.quantileAgg(col("x"), Seq(0.01, 0.5, 0.99)).as("qv"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    (0 until 4).foreach { g =>
      val mine = xs.zipWithIndex.collect { case (x, i) if i % 4 == g => x }
      val sorted = mine.sorted
      val est = out(g)
      // partial-agg merge order is nondeterministic → generous 3× budget
      assert(math.abs(rankOf(sorted, est(0)) - 0.01) <= 6e-3)
      assert(math.abs(rankOf(sorted, est(1)) - 0.5) <= 0.06)
      assert(math.abs(rankOf(sorted, est(2)) - 0.99) <= 6e-3)
    }
    val empty = df.filter(col("x") < -1)
      .agg(TDigest.quantileAgg(col("x"), Seq(0.5)).as("qv")).collect()
    assert(empty.head.isNullAt(0))
  }

  test("stored sketches: per-part sketch + merge equals direct digest path") {
    val s = spark
    import s.implicits._
    val xs = lcgStream(9, 30000)
    val df = xs.zipWithIndex.toSeq
      .map { case (x, i) => (i % 16, x) }.toDF("part", "x")
      .repartition(8)
    // round 1: store one sketch per part (the hostdb/segment shape)
    val sketches = df.groupBy("part")
      .agg(TDigest.sketch(col("x")).as("sk"))
    // later round: merge stored sketches, never rescanning x
    val merged = sketches
      .agg(TDigest.mergeQuantiles(col("sk"), Seq(0.01, 0.5, 0.99)).as("qv"))
      .collect().head.getSeq[Double](0)
    val sorted = xs.sorted
    assert(math.abs(rankOf(sorted, merged(0)) - 0.01) <= 6e-3)
    assert(math.abs(rankOf(sorted, merged(1)) - 0.5) <= 0.06)
    assert(math.abs(rankOf(sorted, merged(2)) - 0.99) <= 6e-3)
    // scalar read-out of a single stored sketch
    val one = sketches.withColumn("p50", TDigest.quantileOf(col("sk"), 0.5))
      .filter(col("part") === 0).collect().head
    val mine = xs.zipWithIndex.collect { case (x, i) if i % 16 == 0 => x }
    assert(math.abs(rankOf(mine.sorted, one.getDouble(2)) - 0.5) <= 0.08)
  }
}
