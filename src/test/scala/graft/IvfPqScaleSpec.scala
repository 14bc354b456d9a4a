package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Measures knn_ivfpq's candidate-scan growth law — the claim in
  * [[QueriesEmbed.ivfpqCandidates]]'s scaladoc, asserted instead of
  * argued. The scan is codes ⋈ probes on cell, so its row count is
  * Σ over (query, probed cell) of that cell's code mass; three
  * regimes follow and this spec measures all three at ×4 data:
  *
  *   - query set ∝ n, cells ∝ n  (batch all-pairs, IVF regime): ~×4
  *   - query set fixed, cells fixed (online serving):           ~×4
  *   - query set ∝ n, cells fixed (the anti-pattern):           ~×16
  *
  * Cells are hash-spread and deterministic — the stage only reads
  * (cell) groupings, so this isolates the growth law from coarse-
  * quantizer quality exactly as SemDedupScaleSpec does for
  * semantic_dedup. Constants mirror the query (M=8 subspaces,
  * NPROBE=2, every-50th queries). */
class IvfPqScaleSpec extends AnyFunSuite with SparkSuite {

  private val M = 8
  private val NPROBE = 2

  private def cellOf(id: Long, k: Int): Long =
    math.floorMod(id * 2654435761L, k.toLong)

  /** (vec_id, cell, m, code): the PQ code table — M rows per vector,
    * cell hash-assigned so cell mass is ~n/k like a trained coarse
    * quantizer's balanced cells. */
  private def codes(n: Int, k: Int): DataFrame = {
    import spark.implicits._
    (0 until n).flatMap { i =>
      (0 until M).map(m => (i.toLong, cellOf(i.toLong, k), m, (i + m) % 256))
    }.toDF("vec_id", "cell", "m", "code").repartition(8)
  }

  /** (q_id, cell, qcdot): NPROBE probed cells per query, q_ids in the
    * query's own id space (every 50th vector, like the query). */
  private def probes(q: Int, k: Int): DataFrame = {
    import spark.implicits._
    (0 until q).flatMap { j =>
      (0 until NPROBE).map(p =>
        (j.toLong * 50L, cellOf(j.toLong + p, k), 0L))
    }.toDF("q_id", "cell", "qcdot").repartition(8)
  }

  test("candidates: linear at k ∝ n or fixed workload, quadratic at " +
      "fixed k with queries ∝ n") {
    val n1 = 4000
    val n2 = 16000
    val target = 250 // cell size the k ∝ n regime holds fixed
    val k1 = n1 / target
    val q1 = n1 / 50
    val q2 = n2 / 50

    val base = QueriesEmbed.ivfpqCandidates(
      codes(n1, k1), probes(q1, k1)).count()
    val grownK = QueriesEmbed.ivfpqCandidates(
      codes(n2, n2 / target), probes(q2, n2 / target)).count()
    val fixedWorkload = QueriesEmbed.ivfpqCandidates(
      codes(n2, k1), probes(q1, k1)).count()
    val fixedK = QueriesEmbed.ivfpqCandidates(
      codes(n2, k1), probes(q2, k1)).count()

    assert(base > 100000L, s"floor not exercised: $base")
    val linRatio = grownK.toDouble / base
    val servRatio = fixedWorkload.toDouble / base
    val quadRatio = fixedK.toDouble / base
    // ×4 data: both linear regimes stay ~×4 (slack for hash-bucket
    // variance); the fixed-k + queries ∝ n regime approaches ×16
    assert(linRatio <= 6.0, s"k∝n regime superlinear: ×$linRatio")
    assert(servRatio <= 6.0, s"fixed-workload regime superlinear: ×$servRatio")
    assert(quadRatio >= 10.0,
      s"fixed-k floor vanished (spec premise broken): ×$quadRatio")
    assert(quadRatio / linRatio >= 2.5,
      s"regimes not separated: quad ×$quadRatio vs lin ×$linRatio")
  }
}
