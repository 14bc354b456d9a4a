package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** The frozen benchmark gram store (r14): repeated decontamination
  * must not recompute or reshuffle the benchmark side per increment.
  * Three contracts: verdict parity with the in-plan gate, catalog-wipe
  * survival (a fresh session re-opens by directory alone), and the
  * Exchange inventory — every Exchange in the probe plan carries
  * increment-derived rows only (the DedupStoreSpec discipline). */
class GramStoreSpec extends AnyFunSuite with SparkSuite {

  private def text(i: Int): String =
    (0 until 12).map(w => s"t${i}w$w").mkString(" ")

  private def docs(rows: Seq[(Long, String)]) = {
    val sp = spark; import sp.implicits._
    rows.toDF("doc_id", "text")
  }

  test("store hits are row-identical to the in-plan census gate, " +
    "survive a catalog wipe, and never move the store side") {
    val root = Files.createTempDirectory("gram-store").toString
    // benchmark: 5 docs; increment: 2 verbatim leaks, 1 doc leaking
    // one 8-gram mid-text, 3 fresh docs
    val bench = docs((0 until 5).map(i => (i.toLong, text(i))))
    GramStore.install(bench, root, buckets = 4)

    // fresh catalog = fresh JVM
    spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith("graft_gramstore_"))
      .foreach(n => spark.sql(s"DROP TABLE `$n`"))
    val store = GramStore.open(spark, root)

    val leakGram = text(3).split(" ").take(8).mkString(" ")
    val increment = docs(Seq(
      (100L, text(0)), (101L, text(4)),
      (102L, s"fresh words only here $leakGram and more fresh after"),
      (103L, text(100)), (104L, text(101)), (105L, text(102))))

    val got = GramStore.hits(increment, store)
    val rows = got.collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_shared_grams")).toMap
    // in-plan twin over the same benchmark
    val benchGrams = graft.QueriesPipeline.wordGrams8(bench)
      .select("g").distinct()
    val expect = graft.QueriesPipeline.contaminationHits(
        graft.QueriesPipeline.wordGrams8(increment), benchGrams)
      .collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_shared_grams")).toMap
    assert(rows == expect, s"\n got: $rows\n exp: $expect")
    assert(rows.keySet == Set(100L, 101L, 102L))
    assert(rows(102L) == 1L) // exactly the one planted 8-gram

    // plan hygiene: the store's bucketed scan satisfies the join in
    // place — no Exchange input mentions the store's table. Pin the
    // increment side to the shuffle regime (AQE would broadcast this
    // test-sized increment and hide the property being asserted).
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = GramStore.hits(increment, store)
      df.collect()
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val sections = p.split("\n\n")
      val exchanges = sections.filter(_.contains(") Exchange"))
      assert(exchanges.nonEmpty, p) // the increment side DOES shuffle
      assert(!exchanges.exists(_.contains("graft_gramstore_")),
        "an Exchange carries the store side:\n" + p)
      assert(p.contains("SelectedBucketsCount") || p.contains("Bucketed: true"),
        "store scan is not bucketed:\n" + p)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }
}
