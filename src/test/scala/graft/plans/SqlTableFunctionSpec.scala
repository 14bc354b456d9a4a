package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** The SQL table-function surface (r14 verdict Next #6) beyond the two
  * oracle-checked board queries: multi-key as-of, usage errors on
  * malformed arguments, and idempotent re-registration. */
class SqlTableFunctionSpec extends AnyFunSuite with SparkSuite {

  private def register(): Unit =
    GraftExtensions.ensureTableFunctions(spark)

  test("asof_join TVF: comma-separated multi-key grouping — keys " +
    "never match across groups") {
    import spark.implicits._
    register()
    // (user, region) composite key: same user in another region must
    // NOT inherit the view
    Seq((1L, "eu", 100L, 10L), (1L, "us", 500L, 11L))
      .toDF("user_id", "region", "ts", "view_event")
      .createOrReplaceTempView("tvf_views")
    Seq((1L, "eu", 200L, 20L), (1L, "us", 300L, 21L),
        (2L, "eu", 400L, 22L))
      .toDF("user_id", "region", "ts", "purchase_event")
      .createOrReplaceTempView("tvf_purchases")
    val got = spark.sql("""
        SELECT purchase_event, view_event
        FROM asof_join('tvf_purchases', 'tvf_views',
                       'user_id, region', 'ts', 'ts')""")
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == Map(
      20L -> 10L,  // (1, eu): view at 100 < 200
      21L -> -1L,  // (1, us): only a FUTURE view (500) exists
      22L -> -1L)) // (2, eu): user 2 never viewed
  }

  test("range_join TVF from SQL matches the Scala operator") {
    import spark.implicits._
    register()
    Seq((1L, 10L, 20L), (2L, 100L, 300L))
      .toDF("band_id", "lo", "hi")
      .createOrReplaceTempView("tvf_bands")
    Seq((7L, 15L), (8L, 250L), (9L, 450L))
      .toDF("pk", "v").createOrReplaceTempView("tvf_points")
    val got = spark.sql("""
        SELECT band_id, pk
        FROM range_join('tvf_bands', 'tvf_points', 'lo', 'hi', 'v')
        ORDER BY band_id""")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 7L), (2L, 8L)))
  }

  test("bm25 TVF: per-query top-k from SQL matches the Scala operator, " +
    "k defaults to 10") {
    import spark.implicits._
    register()
    val docs = Seq(
      (1L, "apple apple banana"), (2L, "apple cherry"),
      (3L, "banana banana banana"), (4L, "durian elderberry fig"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("tvf_bm_docs")
    val queries = Seq((0L, "apple"), (1L, "banana cherry"))
      .toDF("query_id", "text")
    queries.createOrReplaceTempView("tvf_bm_queries")
    val got = spark.sql("""
        SELECT query_id, rank, doc_id, score_bp, n_matched
        FROM bm25('tvf_bm_docs', 'tvf_bm_queries', 2)
        ORDER BY query_id, rank""").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val exp = graft.ops.Bm25.rank(docs, queries, 2)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == exp, s"\n got: $got\n exp: $exp")
    // direction sanity: q0 'apple' ranks doc 1 (tf 2) above doc 2
    assert(got.take(2).map(_._3) == Seq(1L, 2L), got)
    // default k
    assert(spark.sql(
      "SELECT * FROM bm25('tvf_bm_docs', 'tvf_bm_queries')").count() > 0)
  }

  test("decontaminate_hits TVF: raw vs 'norm' matching from SQL — the " +
    "format-drifted leak is caught only under 'norm'") {
    import spark.implicits._
    register()
    val benchText =
      "the quick brown fox jumps over the lazy dog tonight again"
    Seq((10L, "The Quick, Brown FOX jumps  over the LAZY dog; " +
          "tonight... Again!"),
        (11L, benchText),
        (12L, "nothing here overlaps the benchmark in any way at all ok"))
      .toDF("doc_id", "text")
      .createOrReplaceTempView("tvf_dc_corpus")
    Seq(Tuple1(benchText)).toDF("text")
      .createOrReplaceTempView("tvf_dc_bench")
    val raw = spark.sql("""SELECT doc_id FROM
        decontaminate_hits('tvf_dc_corpus', 'tvf_dc_bench')""")
      .collect().map(_.getLong(0)).toSet
    assert(raw == Set(11L), raw)
    val norm = spark.sql("""SELECT doc_id FROM
        decontaminate_hits('tvf_dc_corpus', 'tvf_dc_bench', 'norm')""")
      .collect().map(_.getLong(0)).toSet
    assert(norm == Set(10L, 11L), norm)
  }

  test("classify TVF: trains + scores from SQL, matches the Scala op, " +
    "and a planted long/short corpus separates exactly") {
    import spark.implicits._
    register()
    val docs = ((1L to 6L).map(i =>
        (i, Array.fill(60)("w" + (i % 3)).mkString(" "))) ++
      (7L to 12L).map(i =>
        (i, Array.fill(10)("w" + (i % 3)).mkString(" "))))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("tvf_cl_docs")
    val got = spark.sql("""SELECT doc_id, score, pred, y
        FROM classify('tvf_cl_docs') ORDER BY doc_id""").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val feat = graft.QueriesPipeline.centroidFeatures(docs)
    val exp = graft.QueriesPipeline.centroidScore(feat,
        graft.QueriesPipeline.centroidModel(feat))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == exp.toSeq)
    // planted separation: every long doc +1, every short doc -1
    got.foreach { case (id, _, pred, y) =>
      assert(pred == y && y == (if (id <= 6L) 1L else -1L), (id, pred, y))
    }
  }

  test("malformed arguments fail with the usage message, not a " +
    "resolver stack") {
    register()
    // wrong arity
    val e1 = intercept[Exception](spark.sql(
      "SELECT * FROM asof_join('a', 'b', 'k', 'ts')").collect())
    assert(e1.getMessage.contains("usage: asof_join"), e1.getMessage)
    // non-literal argument
    val e2 = intercept[Exception](spark.sql(
      "SELECT * FROM range_join('tvf_bands', 'tvf_points', 'lo', 'hi', 1+1)")
      .collect())
    assert(e2.getMessage.contains("usage: range_join"), e2.getMessage)
    // bm25: non-positive k
    val e3 = intercept[Exception](spark.sql(
      "SELECT * FROM bm25('a', 'b', 0)").collect())
    assert(e3.getMessage.contains("usage: bm25"), e3.getMessage)
    // decontaminate_hits: bad mode literal
    val e4 = intercept[Exception](spark.sql(
      "SELECT * FROM decontaminate_hits('a', 'b', 'fuzzy')").collect())
    assert(e4.getMessage.contains("usage: decontaminate_hits"),
      e4.getMessage)
    // classify: wrong arity
    val e5 = intercept[Exception](spark.sql(
      "SELECT * FROM classify('a', 'b')").collect())
    assert(e5.getMessage.contains("usage: classify"), e5.getMessage)
  }

  test("re-registration is idempotent (extensions + imperative bridge " +
    "can both run in one session)") {
    register(); register()
    import spark.implicits._
    Seq((1L, 0L, 5L)).toDF("band_id", "lo", "hi")
      .createOrReplaceTempView("tvf_b2")
    Seq((9L, 3L)).toDF("pk", "v").createOrReplaceTempView("tvf_p2")
    assert(spark.sql(
      "SELECT * FROM range_join('tvf_b2', 'tvf_p2', 'lo', 'hi', 'v')")
      .count() == 1L)
  }
}
