package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Pins the r16 centroid featurization scalar
  * (ShingleOps.centroidFeat via QueriesPipeline.centroidFeatures) to
  * the legacy column pipeline it replaces — same (doc_id, y, f, x)
  * row set, so centroid_train / centroid_score / classify_sql keep
  * their results:
  *
  *   centroidFeat(text, 64, 51)  ≡  explode(split(text, " ")) +
  *       filter(length ≥ 1) + pmod(md5Long(tok), 64) +
  *       groupBy(doc, y, f).count + UNION bias row (64, 1),
  *   y = ±1 by size(split(text, " ")) >= 51 (empty tokens COUNTED)
  *
  * including the null-text case (bias row only, y = −1).
  */
class CentroidFeatSpec extends AnyFunSuite with SparkSuite {

  private val CentF = 64
  private val CentGate = 51

  private val docs: Seq[(Long, String)] = Seq(
    (0L, "the quick brown fox"),
    (1L, ("tok " * 60).trim), // above the gate: y = +1
    (2L, ("tok " * 50).trim + " " + "extra"), // exactly 51 tokens
    (3L, "double  spaces  count  for  y  but  not  features"),
    (4L, ""), // split("") = [""]: 1 empty token, no features, bias only
    (5L, null), // null text: bias only, y = -1
    (6L, "café ümlaut 日本語 🎉 unicode tokens"),
    (7L, ("x " * 49).trim + "  pad") // 51 split-tokens incl. an empty one
  )

  private def d: DataFrame = {
    import spark.implicits._
    docs.toDF("doc_id", "text")
  }

  private def legacy: DataFrame = {
    val labeled = d.select(col("doc_id"),
      when(size(split(col("text"), " ")) >= CentGate, lit(1L))
        .otherwise(lit(-1L)).as("y"),
      col("text"))
    labeled
      .select(col("doc_id"), col("y"),
        explode(split(col("text"), " ")).as("tok"))
      .where(length(col("tok")) >= 1)
      .select(col("doc_id"), col("y"),
        pmod(graft.Queries.md5Long(col("tok")), lit(CentF.toLong)).as("f"))
      .groupBy("doc_id", "y", "f").agg(count(lit(1)).as("x"))
      .unionByName(labeled.select(col("doc_id"), col("y"),
        lit(CentF.toLong).as("f"), lit(1L).as("x")))
  }

  test("centroidFeatures equals the explode + groupBy + bias-union form") {
    val want = legacy.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    val got = graft.QueriesPipeline.centroidFeatures(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    assert(want.nonEmpty)
    // both label classes and the null-text bias-only doc are exercised
    assert(want.map(_._2).distinct.size == 2)
    assert(want.count(_._1 == 5L) == 1)
    assert(got == want)
  }
}
