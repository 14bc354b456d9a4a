package graft

import org.scalatest.funsuite.AnyFunSuite

/** The inflation mechanism behind the scale probe must scale
  * cardinalities the way a genuinely larger crawl would: distinct keys
  * ×N, join pairs ×N (never ×N²), dedup signature spaces disjoint
  * across replicas. These invariants are what make SCALE_r9.json's
  * "shuffle grows ~linearly" a meaningful claim. */
class ScaleProbeSpec extends AnyFunSuite with SparkSuite {

  private val dir = "/root/testdata/sf0.001"
  private val N = 4

  private def at(n: Int, table: String) = {
    spark.conf.set("spark.graft.inflate", n.toString)
    try Tables(spark, dir, table)
    finally spark.conf.set("spark.graft.inflate", "1")
  }

  test("row and distinct-key counts scale exactly xN") {
    val base = at(1, "lineitem").cache()
    val inf = at(N, "lineitem").cache()
    assert(inf.count() == N * base.count())
    assert(inf.select("l_orderkey").distinct().count() ==
      N * base.select("l_orderkey").distinct().count())
    assert(inf.select("l_partkey").distinct().count() ==
      N * base.select("l_partkey").distinct().count())
    base.unpersist(); inf.unpersist()
  }

  test("join pairs scale xN, not xN^2 (key remap is consistent)") {
    def pairs(n: Int): Long =
      at(n, "orders").join(at(n, "lineitem"),
        org.apache.spark.sql.functions.col("o_orderkey") ===
          org.apache.spark.sql.functions.col("l_orderkey")).count()
    assert(pairs(N) == N * pairs(1))
  }

  test("dimension tables and their FKs stay fixed") {
    assert(at(N, "nation").count() == at(1, "nation").count())
    // inflated customers still resolve every nationkey against the dim
    val dangling = at(N, "customer").join(at(1, "nation"),
      org.apache.spark.sql.functions.col("c_nationkey") ===
        org.apache.spark.sql.functions.col("n_nationkey"), "left_anti")
    assert(dangling.count() == 0)
  }

  test("document replicas live in EXACTLY disjoint shingle spaces " +
    "(word prefixes: zero cross-replica word n-grams at any n)") {
    import org.apache.spark.sql.functions._
    // N=30 would have broken both letter-substitution designs review
    // killed; the per-word base-26 rep prefix is exact for any N (the
    // prefix widens with N), so the cross-replica shared-shingle count
    // must be ZERO, not merely small
    val N = 30
    def at(n: Int, table: String) = {
      spark.conf.set("spark.graft.inflate", n.toString)
      try Tables(spark, dir, table)
      finally spark.conf.set("spark.graft.inflate", "1")
    }
    val base = at(1, "documents").cache()
    val inf = at(N, "documents").cache()
    // exact: every replica's md5 space is distinct -> xN distinct sigs
    assert(inf.select(md5(col("text"))).distinct().count() ==
      N * base.select(md5(col("text"))).distinct().count())
    // shingles: word 3-grams shared across replicas of the SAME doc
    // must be (near) zero, or near-dup pairs would scale xN^2
    val sh = inf
      .withColumn("rep", pmod(col("doc_id"), lit(N.toLong)))
      .withColumn("orig", (col("doc_id") / N).cast("long"))
      .select(col("orig"), col("rep"), explode(expr(
        "transform(sequence(0, size(split(text, ' ')) - 3), " +
          "i -> concat_ws(' ', slice(split(text, ' '), i + 1, 3)))"))
        .as("shingle"))
    val cross = sh.groupBy("orig", "shingle")
      .agg(countDistinct("rep").as("reps"))
      .filter(col("reps") > 1).count()
    val total = sh.select("orig", "shingle").distinct().count()
    assert(cross == 0, s"$cross of $total shingles cross replicas")
    base.unpersist(); inf.unpersist()
  }

  test("a real grouped query's output scales xN and shuffle stays ~linear") {
    val fn = SparkEntry.queries("node_degrees")
    def run(n: Int): Long = {
      spark.conf.set("spark.graft.inflate", n.toString)
      try fn(spark, dir).count()
      finally spark.conf.set("spark.graft.inflate", "1")
    }
    assert(run(N) == N * run(1))
  }

  test("superlinear detector flags quadratic growth and passes linear") {
    import ScaleProbe.{Point, superlinear}
    val lin = Seq(Point(1, 1, 10, None), Point(10, 9, 100, None),
      Point(100, 95, 1050, None))
    assert(superlinear(lin).isEmpty)
    val quad = Seq(Point(1, 1, 10, None), Point(10, 50, 1000, None))
    assert(superlinear(quad).nonEmpty)
    // noise floor: tiny absolute shuffle never flags
    val tiny = Seq(Point(1, 1, 0.01, None), Point(10, 1, 3.0, None))
    assert(superlinear(tiny).isEmpty)
  }

  test("a series whose EVERY pair is a plan transition cannot escape " +
    "the verdict: quadratic growth fails the flip-allowance bound, a " +
    "bounded one-time flip passes, and a settled pair restores the " +
    "informational treatment") {
    import ScaleProbe.{Point, superlinear}
    // quadratic growth that also flips bhj->smj between the only two
    // points: the old skip-on-transition rule passed this silently
    val quadFlip = Seq(Point(1, 1, 10, None, "bhj=1,smj=0"),
      Point(10, 50, 1000, None, "bhj=0,smj=1"))
    assert(superlinear(quadFlip).nonEmpty,
      "growth-caused plan flip must not hide the growth law")
    // a genuine one-time flip: 10x data, ~2x-linear jump from the
    // newly-shuffled side — inside the 3x flip allowance
    val benignFlip = Seq(Point(1, 1, 10, None, "bhj=1,smj=0"),
      Point(10, 9, 300, None, "bhj=0,smj=1"))
    assert(superlinear(benignFlip).isEmpty)
    // when another pair SETTLES the series at the same shape, the
    // transition pair stays informational even at a big ratio
    val settled = Seq(Point(1, 1, 10, None, "bhj=1,smj=0"),
      Point(10, 9, 1000, None, "bhj=0,smj=1"),
      Point(100, 90, 10500, None, "bhj=0,smj=1"))
    assert(superlinear(settled).isEmpty)
  }

  test("no analytic rescue: a noisy-midpoint series and a late-onset " +
    "quadratic are indistinguishable from three points, so BOTH fail " +
    "the verdict (the main loop settles noise by re-measuring)") {
    import ScaleProbe.{Point, superlinear}
    // midpoint under-shuffles (AQE broadcast variance): 10->100 reads
    // 17x for 10x even though 1->100 is 87x for 100x — still a finding;
    // only a clean RE-MEASUREMENT may clear it, never an envelope test
    val noisy = Seq(Point(1, 1, 0.8, None, "bhj=8,smj=0"),
      Point(10, 2, 4.1, None, "bhj=8,smj=0"),
      Point(100, 8, 69.6, None, "bhj=8,smj=0"))
    assert(superlinear(noisy).nonEmpty)
    // the reason no envelope rescue is sound: a quadratic hiding under
    // a fixed-overhead floor has the SAME clean envelope (100x for
    // 100x) with a genuinely super-linear final decade
    val lateQuad = Seq(Point(1, 1, 6.0, None, "bhj=8,smj=0"),
      Point(10, 2, 12.0, None, "bhj=8,smj=0"),
      Point(100, 50, 600.0, None, "bhj=8,smj=0"))
    assert(superlinear(lateQuad).nonEmpty,
      "late-onset quadratic must not escape via any envelope/trend test")
  }
}
