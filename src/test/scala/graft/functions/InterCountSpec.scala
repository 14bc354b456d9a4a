package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Pins the r16 ngram_jaccard verify scalars to the column pipeline
  * they replace — same values, so the oracle-checked query keeps its
  * results:
  *
  *   interCountSorted(sortedLongs(a), sortedLongs(b))
  *     ≡ size(array_intersect(a, b))
  *
  * for arbitrary long arrays INCLUDING duplicates (mod-P collisions in
  * the hbs profile keep duplicates — each common distinct value must
  * count exactly once) and empty arrays. sortedLongs is set-preserving,
  * so sorting one side of array_intersect is also checked to be a
  * no-op on the count.
  */
class InterCountSpec extends AnyFunSuite with SparkSuite {

  // deterministic pseudo-random arrays with a small value universe so
  // duplicates and overlaps are dense
  private def arr(seed: Long, n: Int, mod: Long): Seq[Long] = {
    var x = seed
    (0 until n).map { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      math.floorMod(x >>> 17, mod)
    }
  }

  private val cases: Seq[(Seq[Long], Seq[Long])] = Seq(
    (Seq.empty[Long], Seq.empty[Long]),
    (Seq.empty[Long], Seq(1L, 2L, 3L)),
    (Seq(5L), Seq(5L)),
    (Seq(5L, 5L, 5L), Seq(5L, 5L)), // duplicates: count once
    (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)), // disjoint
    (Seq(Long.MinValue, -1L, 0L, Long.MaxValue),
      Seq(Long.MaxValue, 0L, Long.MinValue)), // extremes, unsorted input
    (arr(1, 200, 50), arr(2, 300, 50)), // dense duplicate overlap
    (arr(3, 1000, 100000), arr(4, 1000, 100000)), // sparse overlap
    (arr(5, 64, 7), arr(6, 4096, 7)) // very asymmetric sizes
  )

  private def df: DataFrame = {
    import spark.implicits._
    cases.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("id", "a", "b")
  }

  test("interCountSorted(sortedLongs) equals size(array_intersect)") {
    val got = df.select(col("id"),
        Similarity.interCountSorted(
          Similarity.sortedLongs(col("a")),
          Similarity.sortedLongs(col("b"))).as("got"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("want"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"case ${r.getInt(0)}: merge=${r.getLong(1)} hash=${r.getLong(2)}")
    }
  }

  test("sortedLongs is an ascending set-preserving permutation") {
    val rows = df.select(col("a"),
      Similarity.sortedLongs(col("a")).as("s")).collect()
    rows.foreach { r =>
      val a = r.getSeq[Long](0)
      val s = r.getSeq[Long](1)
      assert(s == a.sorted, s"not the ascending sort of $a: $s")
    }
  }
}
