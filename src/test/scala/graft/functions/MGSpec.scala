package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** The Misra–Gries heavy-hitters sketch's contracts, in both regimes:
  * capacity ≥ distinct keys (exact — the regime the `heavy_hitters`
  * oracle pins) and capacity ≪ distinct under planted 30%-hot skew
  * (candidate recall, undercount ≤ err ≤ n/(c+1), and the two-pass
  * exact-recount top-k equal to a plain groupBy top-k). */
class MGSpec extends AnyFunSuite with SparkSuite {

  // 10 hot keys at ~3% each (30% of the stream) + a uniform tail over
  // 5000 cold keys — hot frequency 600 ≫ n/(c+1) = 20000/257 ≈ 78,
  // so MG guarantees every hot key survives a capacity-256 summary
  private val hot = (0 until 10).map(i => s"hot$i")
  private val stream: Seq[String] =
    hot.flatMap(k => Seq.fill(600)(k)) ++
      (0 until 14000).map(i => s"cold${i % 5000}")

  private def sparkSummary(keys: Seq[String], capacity: Int)
      : Seq[(String, Long, Long)] = {
    val sp = spark; import sp.implicits._
    keys.toDF("k").repartition(8)
      .agg(FreqSketch.mgTopK(col("k"), capacity).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.key"), col("e.est"), col("e.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
  }

  test("exact regime: capacity >= distinct keys gives every key its " +
    "exact count with err = 0, under 8-partition distributed merge") {
    val keys = (0 until 2000).map(i => s"k${i % 37}")
    val got = sparkSummary(keys, capacity = 64).map(e => e._1 -> e._2).toMap
    val truth = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == truth)
    assert(sparkSummary(keys, 64).forall(_._3 == 0L))
  }

  test("planted 30%-hot skew at capacity 256 over 5010 distinct keys: " +
    "every hot key survives, estimates bracket truth within err, " +
    "err <= n/(capacity+1)") {
    val got = sparkSummary(stream, capacity = 256)
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val byKey = got.map(e => e._1 -> e._2).toMap
    assert(hot.forall(byKey.contains), got.take(12))
    val err = got.head._3
    assert(err <= stream.size.toLong / 257, err)
    assert(got.forall { case (k, est, e) =>
      est <= truth(k) && truth(k) <= est + e
    })
  }

  test("two-pass exact top-k: sketch candidates + exact recount equals " +
    "the plain groupBy top-k at capacity far below distinct") {
    val sp = spark; import sp.implicits._
    val df = stream.toDF("k").repartition(8)
    val cand = df.agg(FreqSketch.mgTopK(col("k"), 256).as("hh"))
      .select(explode(col("hh")).as("e")).select(col("e.key").as("k"))
    val twoPass = df.join(broadcast(cand), "k")
      .groupBy("k").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("k")).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val exact = df.groupBy("k").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("k")).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(twoPass == exact)
    assert(twoPass.map(_._1).toSet == hot.toSet)
  }

  test("serialization round-trips the summary byte-exactly and merge " +
    "rejects mismatched capacities") {
    val s = new MGSummary(16)
    ('a' to 'z').foreach(c => (0 to c - 'a').foreach(_ => s.add(c.toString)))
    val rt = MGSummary.fromBytes(s.toBytes)
    assert(java.util.Arrays.equals(rt.toBytes, s.toBytes))
    assert(rt.total == s.total && rt.err == s.err && rt.counts == s.counts)
    intercept[IllegalArgumentException] {
      s.merge(new MGSummary(8))
    }
  }

  test("pairwise merge preserves the bounds: two half-stream summaries " +
    "merged keep hot-key recall and the additive error budget") {
    val (l, r) = stream.splitAt(stream.size / 2)
    def serial(keys: Seq[String]) = {
      val s = new MGSummary(256); keys.foreach(s.add); s
    }
    val a = serial(l)
    val b = serial(r)
    val budget = a.err + b.err + (a.total + b.total) / 257
    a.merge(b)
    assert(a.total == stream.size.toLong)
    assert(a.err <= budget, s"${a.err} > $budget")
    assert(hot.forall(a.counts.contains))
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(a.counts.forall { case (k, est) =>
      est <= truth(k) && truth(k) <= est + a.err
    })
  }
}
