package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Pins the r16 window/line scalars (ShingleOps.spanHashes /
  * spanHashesDistinct / lineHashes, VecOps.residQ) to the legacy
  * column pipelines they replace — same rows, so no oracle-checked
  * query changes its results:
  *
  *   spanHashes(text, W)  ≡ explode(sequence(0, size(ws)−W)) +
  *                          md5Long(concat_ws(" ", slice(ws, p+1, W)))
  *                          over ws = split(text, " "), size ≥ W
  *   lineHashes(text, k)  ≡ explode(sequence(0, ceil(size/k)−1)) +
  *                          md5Long(concat_ws(" ", slice(ws, p·k+1, k)))
  *   residQ(a, b)         ≡ zip_with(a, b, (x, y) => x − y)
  */
class SpanLineHashSpec extends AnyFunSuite with SparkSuite {

  private val docs = Seq(
    // shorter than W, exactly W, longer; empties from double spaces;
    // repeated windows (duplicates must be KEPT by spanHashes);
    // unicode; empty text; single token
    "one two three",
    "a b c d e f g h i j k l m n o",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",
    "w w w w w w w w w w w w w w w w w w w w",
    "double  space  tokens  here " + ("pad " * 20).trim,
    "café → ümlaut " + ("tøk " * 30).trim,
    "",
    "solo",
    ("x " * 9).trim, // 9 tokens: one short line, no 15-window
    ("y " * 10).trim, // exactly one full line
    ("z " * 11).trim // one full + one short line
  )

  private def d: DataFrame = {
    import spark.implicits._
    docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  private def sortedRows(df: DataFrame): Seq[(Long, Int, Long)] =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .toSeq.sorted

  test("spanHashes (pos, h) rows equal the explode+slice pipeline") {
    for (w <- Seq(2, 15)) {
      val legacy = d
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .where(size(col("ws")) >= w)
        .select(col("doc_id"),
          explode(sequence(lit(0), size(col("ws")) - w)).as("pos"),
          col("ws"))
        .select(col("doc_id"), col("pos"),
          graft.Queries.md5Long(concat_ws(" ",
            slice(col("ws"), col("pos") + 1, lit(w)))).as("h"))
      val scalar = d.select(col("doc_id"),
        posexplode(Similarity.spanHashes(col("text"), w))
          .as(Seq("pos", "h")))
      assert(sortedRows(scalar) == sortedRows(legacy), s"w=$w")
      assert(sortedRows(legacy).nonEmpty)
    }
  }

  test("spanHashesDistinct equals distinct (doc_id, h) of the pipeline") {
    val w = 15
    val legacy = d
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .where(size(col("ws")) >= w)
      .select(col("doc_id"),
        explode(sequence(lit(0), size(col("ws")) - w)).as("p"), col("ws"))
      .select(col("doc_id"),
        graft.Queries.md5Long(concat_ws(" ",
          slice(col("ws"), col("p") + 1, lit(w)))).as("h"))
      .distinct()
    val scalar = d.select(col("doc_id"),
      explode(Similarity.spanHashesDistinct(col("text"), w)).as("h"))
    def rows(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(rows(scalar) == rows(legacy))
    // duplicates actually exist in the fixture (the all-"w" doc), so
    // the dedup is exercised
    assert(rows(legacy).size <
      sortedRows(d.select(col("doc_id"),
        posexplode(Similarity.spanHashes(col("text"), w))
          .as(Seq("pos", "h")))).size)
  }

  test("lineHashes equals the explode+slice line splitter") {
    val k = 10
    val legacy = d
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("ws"),
        explode(sequence(lit(0),
          (ceil(size(col("ws")) / (k * 1.0)) - 1).cast("int")))
          .as("line_no"))
      .select(col("doc_id"), col("line_no"),
        graft.Queries.md5Long(concat_ws(" ",
          slice(col("ws"), col("line_no") * k + 1, lit(k)))).as("lh"))
    val scalar = d.select(col("doc_id"),
      posexplode(Similarity.lineHashes(col("text"), k))
        .as(Seq("line_no", "lh")))
    assert(sortedRows(scalar) == sortedRows(legacy))
    // every doc yields at least one line, including the empty text
    assert(scalar.select("doc_id").distinct().count() == docs.size)
  }

  test("nonEmptyTokens equals the explode+filter+count dl pipeline") {
    // the BM25 document length: explode(split) + length >= 1 + count
    // per doc — docs with ZERO qualifying tokens must stay absent
    val legacy = d
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) >= 1)
      .groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val scalar = d
      .select(col("doc_id"),
        Similarity.nonEmptyTokens(col("text")).as("dl"))
      .where(col("dl") > 0)
    def rows(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(rows(scalar) == rows(legacy))
    // the empty-text doc is dropped by BOTH forms
    assert(rows(scalar).size == docs.size - 1)
    // null text drops via null > 0 (explode-drop semantics)
    import spark.implicits._
    val withNull = Seq((1L, "a b"), (2L, null)).toDF("doc_id", "text")
      .select(col("doc_id"),
        Similarity.nonEmptyTokens(col("text")).as("dl"))
      .where(col("dl") > 0)
    assert(withNull.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("residQ equals zip_with subtraction on equal-length arrays") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val vecs = (1 to 50).map { i =>
      (i.toLong, Array.fill(64)(rng.nextLong() % 1000000L),
        Array.fill(64)(rng.nextLong() % 1000000L))
    }
    val df = vecs.toDF("id", "a", "b")
    val both = df.select(col("id"),
      Similarity.residQ(col("a"), col("b")).as("s"),
      zip_with(col("a"), col("b"), (x, y) => x - y).as("l"))
    assert(both.where(col("s") =!= col("l")).count() == 0)
    assert(both.where(col("s") === col("l")).count() == 50)
    // null propagation matches zip_with
    val n = df.select(
      Similarity.residQ(lit(null).cast("array<long>"), col("b")).as("s"))
    assert(n.where(col("s").isNull).count() == 50)
  }
}
