package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Bucketed

/** Frozen benchmark gram store for REPEATED decontamination — the
  * [[DedupStore]] discipline applied to the benchmark side of the
  * `decontaminate` gate.
  *
  * A training pipeline decontaminates EVERY crawl increment against
  * the same eval suites. The in-plan gate (`QueriesPipeline
  * .contaminationHits`) recomputes the benchmark's distinct 8-grams
  * per run and — past broadcast range — reshuffles them per run too:
  * exactly the cost a frozen side must not pay. This store
  * materializes the grams ONCE, bucketed on the gram text, so each
  * increment's probe join reads the store in place and only
  * increment-derived rows move (DecontaminateStoreSpec asserts the
  * Exchange inventory). Re-install at benchmark-publish cadence.
  *
  * The bucket count is recorded in a `buckets` sidecar at install, so
  * consumers open by directory alone — and [[isStore]] lets the CLI's
  * `-decontaminate <dir>` accept either a raw benchmark parquet dir
  * (in-plan gate) or a store dir (this path) without a second flag. */
object GramStore {

  private def tag(dir: String): String =
    "graft_gramstore_" + dir.replaceAll("[^A-Za-z0-9]", "_").takeRight(40) +
      "_" + Integer.toHexString(dir.hashCode)

  /** Materialize the benchmark's distinct word 8-grams, bucketed on
    * `g`. One synthetic doc_id per bench row (wordGrams8 windows per
    * doc — a shared id would interleave two docs' tokens). */
  def install(benchDocs: DataFrame, dir: String, buckets: Int): Unit = {
    require(benchDocs.columns.contains("text"),
      s"gram store input needs a `text` column, has " +
        benchDocs.columns.mkString(", "))
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val grams = graft.QueriesPipeline.wordGrams8(
        benchDocs.select(monotonically_increasing_id().as("doc_id"),
          col("text")))
      .select("g").distinct()
    Bucketed.install(grams, tag(dir), s"$dir/grams", buckets, key = "g")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "buckets"), buckets.toString)
  }

  /** True iff `dir` holds a store written by [[install]]. */
  def isStore(dir: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "grams")) &&
      java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "buckets"))

  /** Re-open a store (re-registers the bucketed layout in a fresh
    * session's catalog; bucket count comes from the sidecar). */
  def open(spark: SparkSession, dir: String): DataFrame = {
    val buckets = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "buckets")).trim.toInt
    val t = tag(dir)
    if (!spark.catalog.tableExists(t))
      Bucketed.register(spark, t, s"$dir/grams", buckets, key = "g")
    spark.table(t)
  }

  /** (doc_id, n_shared_grams) for every increment doc sharing ≥1 gram
    * with the frozen store — row-identical to `contaminationHits` over
    * the same benchmark, but the store side never moves: the
    * increment's grams shuffle into the store's bucketing (or
    * broadcast, if AQE sizes the increment under the threshold) and
    * the store's table scan satisfies the join's distribution in
    * place. */
  def hits(increment: DataFrame, storeGrams: DataFrame): DataFrame =
    graft.QueriesPipeline.wordGrams8(
        increment.select(col("doc_id"), col("text")))
      .join(storeGrams, "g")
      .groupBy("doc_id")
      .agg(countDistinct(col("g")).as("n_shared_grams"))
}
