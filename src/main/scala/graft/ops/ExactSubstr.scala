package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** ExactSubstr span-removal builders (Lee et al., "Deduplicating
  * Training Data Makes Language Models Better", ACL 2022), shared by
  * the `exact_substr_dedup` / `incremental_substr` queries, the
  * `corpus -exactsubstr` stage, and [[DedupStore.exactSubstrIncrement]].
  *
  * Lives outside the Queries* objects on purpose: those objects'
  * initializers are mutually entangled (`Queries.all` reads every
  * `Queries*.all`, and each Q's eagerly-built oracle string calls back
  * into `Queries` helpers), so an operator entry point like DedupStore
  * triggering a Queries* class-init directly would deadlock that cycle
  * into a null `all` (ExceptionInInitializerError). This object holds
  * plain builders only — no Q vals, no oracle strings.
  */
object ExactSubstr {

  /** Overlapping W-token window hashes of a (doc_id, text) frame:
    * (doc_id, pos, h) — the shared front half of the family. */
  def windows(d: DataFrame, W: Int = 15): DataFrame =
    d.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .where(size(col("ws")) >= W)
      .select(col("doc_id"),
        explode(sequence(lit(0), size(col("ws")) - W)).as("pos"), col("ws"))
      .select(col("doc_id"), col("pos"),
        Hashing.md5Long(concat_ws(" ",
          slice(col("ws"), col("pos") + 1, lit(W)))).as("h"))

  /** The removal back half from pre-computed duplicated-window START
    * positions (`starts`: doc_id, pos — may contain duplicates; they
    * are collapsed here so callers can union independently-derived
    * start sets without a store-sized distinct): cut every covered
    * token position and rebuild the text. Returns one row per doc
    * with `n_tokens`, `n_removed`, and `clean_text` — the surviving
    * tokens in order. The coverage pass is a per-document ROWS window
    * over dense token positions (state = W−1 rows); the rebuild is a
    * per-document sorted collect bounded by one document. */
  def cleanFromStarts(d: DataFrame, starts: DataFrame,
      W: Int = 15): DataFrame = {
    val toks = d.select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
    val ds = starts.select(col("doc_id"), col("pos")).distinct()
      .withColumn("ds", lit(1))
    val wp = Window.partitionBy("doc_id").orderBy("pos")
    val cov = toks.join(ds, Seq("doc_id", "pos"), "left")
      .select(col("doc_id"), col("pos"), col("w"),
        coalesce(max(col("ds")).over(wp.rowsBetween(-(W - 1), 0)), lit(0))
          .as("c"))
    cov.groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("c")).cast("long").as("n_removed"),
        array_join(transform(
          array_sort(collect_list(
            when(col("c") === 0, struct(col("pos"), col("w"))))),
          x => x.getField("w")), " ").as("clean_text"))
  }

  /** The removal back half keyed by a DUPLICATED window-hash set
    * (corpus-wide count, frozen-store membership, or their union). */
  def cleanAgainst(d: DataFrame, dupH: DataFrame,
      W: Int = 15): DataFrame =
    cleanFromStarts(d,
      windows(d, W).join(dupH, "h").select(col("doc_id"), col("pos")), W)

  /** Corpus self-dedup: duplicated = any window hash seen in more than
    * one document of `d` itself. */
  def clean(d: DataFrame, W: Int = 15): DataFrame = {
    val dupH = windows(d, W).groupBy("h")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .where(col("nd") > 1).select("h")
    cleanAgainst(d, dupH, W)
  }
}
