package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Measures semantic_dedup's growth law — the claim in its scaladoc,
  * asserted instead of argued: candidate-pair volume is ~LINEAR in n
  * when cluster count grows with n (SemDeDup's own regime: the paper
  * runs k = 50k on 1.7B examples, holding cluster size fixed), and
  * ~QUADRATIC at fixed cluster count, because any continuous-cosine
  * LSH band keeps p₂ > 0 random-collision mass (4 bands × 8 sign
  * bits → expected colliding pairs ≈ 4·C(m,2)/256 per cluster of m
  * random vectors). Vectors come from a fixed LCG; clusters are
  * hash-assigned with synthetic centroid-cos — the candidate stage
  * only reads (cell, band bits, ccos order), so this isolates the
  * growth law from quantizer quality. */
class SemDedupScaleSpec extends AnyFunSuite with SparkSuite {

  private def vectors(n: Int, k: Int): DataFrame = {
    import spark.implicits._
    var s = 42L
    def nx(): Double = {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    }
    val rows = (0 until n).map { i =>
      (i.toLong, Array.fill(64)(nx().toFloat))
    }
    rows.toDF("vec_id", "embedding")
      .repartition(8)
      .select(col("vec_id"),
        graft.functions.Similarity.quantized(col("embedding")).as("qv"))
      .withColumn("nsq", graft.functions.Similarity.normSqQ(col("qv")))
      // hash-spread cluster assignment + deterministic ccos order
      .withColumn("cell", pmod(col("vec_id") * 2654435761L, lit(k)))
      .withColumn("ccos", (col("vec_id") % 1000) / 1000.0)
  }

  test("candidates grow ~linearly when k ∝ n, ~quadratically at fixed k") {
    val n1 = 4000
    val n2 = 16000
    val target = 250 // cluster size the k ∝ n regime holds fixed
    val candSmall = QueriesEmbed.semanticCandidates(
      vectors(n1, n1 / target)).count()
    val candGrownK = QueriesEmbed.semanticCandidates(
      vectors(n2, n2 / target)).count()
    val candFixedK = QueriesEmbed.semanticCandidates(
      vectors(n2, n1 / target)).count()
    assert(candSmall > 1000, s"floor not exercised: $candSmall")
    val linRatio = candGrownK.toDouble / candSmall
    val quadRatio = candFixedK.toDouble / candSmall
    // ×4 data: linear regime stays ~×4 (slack for hash-bucket
    // variance); fixed-k regime approaches ×16
    assert(linRatio <= 6.0, s"k∝n regime superlinear: ×$linRatio")
    assert(quadRatio >= 10.0,
      s"fixed-k floor vanished (spec premise broken): ×$quadRatio")
    assert(quadRatio / linRatio >= 2.5,
      s"regimes not separated: quad ×$quadRatio vs lin ×$linRatio")
  }
}
