package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Pins the r16 simhash scalar (ShingleOps.simhash60) to the legacy
  * column pipeline it replaces — same (doc_id, simhash) rows, so the
  * oracle-checked simhash query keeps its results:
  *
  *   simhash60(text, 2)  ≡  explode(split(text, " ")) +
  *                          filter(length(tok) >= 2) + md5Long(tok) +
  *                          groupBy(doc).agg(60 ±1 vote sums) +
  *                          Σ (v_i > 0) << i
  *
  * including the doc-drop for texts with NO ≥2-char token (null from
  * the scalar, no groups from the aggregate).
  */
class SimhashScalarSpec extends AnyFunSuite with SparkSuite {

  private val docs = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the the the the repeated tokens vote harder",
    "a b c d e", // every token 1 char: dropped by BOTH forms
    "x", // single 1-char token: dropped
    "", // empty text: dropped
    "ab", // exactly one 2-char token
    "double  spaces  make  empty  tokens",
    "café ümlaut tøkens — unicode 2+ chars",
    "日本 語 テスト", // multi-byte: 日本=2 chars keeps, 語=1 char drops
    "🎉🎊 🎈 mixed emoji tokens", // 🎉🎊=2 chars keeps, 🎈=1 char drops
    ("tok " * 500).trim // long doc
  )

  private def d: DataFrame = {
    import spark.implicits._
    docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  private def legacy: DataFrame = {
    val tok = d.select(col("doc_id"),
        explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) >= 2)
      .withColumn("h60", Hashing.md5Long(col("token")))
    val voteCols = (0 until 60).map { i =>
      sum(when(expr(s"(shiftright(h60, $i) & 1) = 1"), 1).otherwise(-1))
        .as(s"v$i")
    }
    tok.groupBy(col("doc_id")).agg(voteCols.head, voteCols.tail: _*)
      .select(col("doc_id"),
        (0 until 60).map(i =>
          when(col(s"v$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  private def scalar: DataFrame =
    d.select(col("doc_id"), Similarity.simhash60(col("text"), 2)
      .as("simhash")).where(col("simhash").isNotNull)

  test("simhash60 equals the explode + 60-vote aggregate, drops included") {
    val want = legacy.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).toSeq
    val got = scalar.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).toSeq
    assert(want.nonEmpty && want.size < docs.size) // both effects present
    assert(got == want)
  }
}
