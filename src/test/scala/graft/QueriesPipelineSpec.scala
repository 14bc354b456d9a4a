package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic + plan-shape checks for the round-5 training-data-pipeline
  * operators (QueriesPipeline). The DuckDB oracle proves cross-engine
  * equality; these tests pin the invariants the oracle can't see —
  * planted-signal behavior, codegen shape, broadcast sides. */
class QueriesPipelineSpec extends AnyFunSuite with SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = Queries.byName(name).build(spark, dir)

  test("quality_gopher fractions are in range and verdict is consistent") {
    val rows = run("quality_gopher").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val top2 = r.getAs[Long]("top2_frac_bp")
      val dup3 = r.getAs[Long]("dup3_frac_bp")
      assert(top2 >= 0 && top2 <= 10000, r)
      assert(dup3 >= 0 && dup3 <= 10000, r)
      val expected = if (top2 <= 2000 && dup3 <= 1800) "keep" else "reject"
      assert(r.getAs[String]("gopher_verdict") == expected, r)
    }
    // the 31-word synthetic vocab repeats bigrams heavily: the repetition
    // signal must actually fire (not a corpus where every doc is 0 bp)
    assert(rows.exists(_.getAs[Long]("dup3_frac_bp") > 0))
  }

  test("quality_gopher stays in whole-stage codegen (no interpreted lambda)") {
    val df = run("quality_gopher")
    df.collect() // AQE finalizes (and codegen-wraps) on run
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("* HashAggregate"), p)
    // gram construction is posexplode+lead, not a higher-order transform
    assert(!p.contains("transform("), p)
  }

  test("pii_scrub finds every planted PII instance and scrubs it") {
    val rows = run("pii_scrub").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_email") == 2, r) // user@example.com + admin@mail.test
      assert(r.getAs[Long]("n_ip") == 1, r)
      assert(r.getAs[Long]("n_phone") == 1, r)
    }
  }

  test("pii_scrub redaction removes the PII from the scrubbed text") {
    // recompute the scrub pipeline on one row and check placeholders
    val d = Queries.t(spark, dir, "documents").limit(1)
    val planted = concat(col("text"), lit(" reach me at a.b@x.org or 1.2.3.4"))
    val scrubbed = regexp_replace(
      regexp_replace(planted,
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
      "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "<IP>")
    val out = d.select(scrubbed.as("s")).head().getString(0)
    assert(out.contains("<EMAIL>") && out.contains("<IP>"), out)
    assert(!out.contains("@") && !out.contains("1.2.3.4"), out)
  }

  test("decontaminate flags every benchmark document (self-contamination)") {
    val flagged = run("decontaminate").collect()
      .map(r => r.getAs[Long]("doc_id")).toSet
    val bench = Queries.t(spark, dir, "documents")
      .where(col("doc_id") % 25 === 0)
      // docs shorter than 8 tokens contribute no 8-gram
      .where(size(split(col("text"), " ")) >= 8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(bench.subsetOf(flagged), s"missing: ${bench -- flagged}")
  }

  test("decontaminate broadcasts the benchmark gram set") {
    val p = run("decontaminate").queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("sample_stratified keeps a deterministic subset within budget rates") {
    val kept = run("sample_stratified")
    val kept2 = run("sample_stratified")
    // deterministic: same rows both runs
    assert(kept.exceptAll(kept2).isEmpty && kept2.exceptAll(kept).isEmpty)
    // every kept doc is a real doc with its real token count
    val joined = kept.join(
      Queries.t(spark, dir, "documents").select(col("doc_id"),
        graft.functions.TextAnalysis.tokenCount(col("text")).as("nt")),
      "doc_id")
    assert(joined.where(col("n_tokens") =!= col("nt")).isEmpty)
  }

  test("sample_stratified has no window/sort — broadcast rate join only") {
    val p = run("sample_stratified").queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("Window"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }
}
