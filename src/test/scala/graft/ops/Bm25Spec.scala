package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** The multi-query BM25 op beyond the oracle queries: scoring
  * direction, the distinct-term contract, and the plan shape that must
  * survive 100 TB — per-query top-k through the O(k) bounded aggregate
  * (never a sort or a window), query-side joins broadcast. Fixture
  * keeps every probed term under df ≤ N/2 so idf stays positive (BM25's
  * smoothed idf goes negative for majority terms by definition — a
  * direction test on a majority term would assert the flip, not the
  * law). */
class Bm25Spec extends AnyFunSuite with SparkSuite {

  private def docs = {
    val sp = spark; import sp.implicits._
    Seq(
      (1L, "apple apple apple banana banana banana"),
      (2L, "apple banana cherry durian banana banana"),
      (3L, "cherry cherry cherry cherry"),
      (4L, "durian elderberry fig grape"),
      (5L, "fig grape elderberry durian"),
      (6L, "banana banana banana banana"))
      .toDF("doc_id", "text")
  }

  test("tf direction and distinct-term contract: repeating a query " +
    "term does not double its weight; at equal length, higher tf wins") {
    val sp = spark; import sp.implicits._
    val q = Seq((0L, "apple"), (1L, "apple apple")).toDF("query_id", "text")
    val got = Bm25.rank(docs, q, 5).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("rank"))
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_bp")))
        .toSeq)
      .toMap
    // same query text after the distinct => identical ranking
    assert(got(0L) == got(1L), got)
    // apple: df 2 of 6 docs (positive idf); docs 1 and 2 share dl=6,
    // so tf 3 must outrank tf 1 and nothing else matches
    assert(got(0L).map(_._1) == Seq(1L, 2L), got(0L))
    assert(got(0L).head._2 > got(0L)(1)._2, got(0L))
  }

  test("rank is dense 1..k per query with the (score DESC, doc_id) " +
    "tiebreak") {
    val sp = spark; import sp.implicits._
    val q = Seq((7L, "cherry durian")).toDF("query_id", "text")
    val rows = Bm25.rank(docs, q, 3).collect()
      .sortBy(_.getAs[Int]("rank"))
    assert(rows.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3))
    val scores = rows.map(_.getAs[Long]("score_bp")).toSeq
    assert(scores == scores.sorted.reverse, scores)
  }

  test("plan shape: per-query top-k is the bounded aggregate — no " +
    "Sort, no Window, no global TakeOrdered on the scored frame") {
    val sp = spark; import sp.implicits._
    val q = Seq((0L, "apple banana"), (1L, "cherry"))
      .toDF("query_id", "text")
    val df = Bm25.rank(docs, q, 2)
    df.collect()
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("bounded_sorted_list"), p)
    assert(!p.contains("Window"), p)
    // the only acceptable sort would be inside SMJ — and at this size
    // with broadcast sides there must be none at all
    assert(!p.split("\n").exists(l =>
      l.contains(") Sort") && !l.contains("SortAggregate")), p)
  }
}
