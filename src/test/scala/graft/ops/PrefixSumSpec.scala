package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Property test for the two-phase distributed prefix scan: on random
  * frames — random group-count/skew (incl. one-group and all-distinct
  * extremes), null groups, negative values, empty input — the result
  * is bit-identical to the group-partitioned window it replaces.
  * (SkewSpec holds the planted-90%-hot balance proof; this holds the
  * semantics across shapes no single fixture picks.) */
class PrefixSumSpec extends AnyFunSuite with SparkSuite {

  test("groupedRunningSum == the group window on 25 random frames") {
    import spark.implicits._
    val rnd = new scala.util.Random(1123)
    for (trial <- 0 until 25) {
      val n = 1 + rnd.nextInt(3000)
      val groups = 1 + rnd.nextInt(12)
      val hot = rnd.nextInt(100) // % of rows on group 0
      val rows = (0 until n).map { i =>
        val g =
          if (rnd.nextInt(100) < 7) null
          else if (rnd.nextInt(100) < hot) "g0"
          else s"g${rnd.nextInt(groups)}"
        (g, i.toLong, rnd.nextLong(2001) - 1000) // ord unique per frame
      }
      val df = spark.createDataset(rows).toDF("g", "ord", "v")
        .repartition(1 + rnd.nextInt(7))
      val got = PrefixSum
        .groupedRunningSum(df, col("g"), col("ord"), col("v"), "cum")
        .select("g", "ord", "cum").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      val want = df.withColumn("cum",
          sum(col("v")).over(Window.partitionBy("g").orderBy("ord")))
        .select("g", "ord", "cum").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == want, s"trial $trial (n=$n groups=$groups hot=$hot)")
    }
    // empty input
    val empty = spark.createDataset(Seq.empty[(String, Long, Long)])
      .toDF("g", "ord", "v")
    assert(PrefixSum.groupedRunningSum(
      empty, col("g"), col("ord"), col("v"), "cum").count() == 0)
  }
}
