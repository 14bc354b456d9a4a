package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    * (doc_id, pos, h) — the shared front half of the family.
    *
    * r16: one scalar pass (ShingleOps.spanHashes via posexplode —
    * pinned row-identical to the explode(sequence)+slice form by
    * SpanLineHashSpec, including the size ≥ W drop and null-text
    * drop); the replaced form copied the whole token array into every
    * exploded (doc, pos) row — quadratic bytes per document. */
  def windows(d: DataFrame, W: Int = 15): DataFrame =
    d.select(col("doc_id"),
      posexplode(graft.functions.Similarity.spanHashes(col("text"), W))
        .as(Seq("pos", "h")))

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
    // r15: the rebuild is one doc-local scalar (ProfileOps.cutSpans)
    // over (text, collected start positions) — the old form exploded
    // EVERY corpus token, joined the starts per (doc_id, pos), ran a
    // MAX-over-(W−1)-rows window per doc, and re-assembled the text
    // through an interpreted collect_list+array_sort+transform. Only
    // the duplicated START positions (sparse by construction) shuffle
    // now, grouped to one doc-sized array; coverage, counting, and the
    // in-order rebuild happen row-locally with identical output.
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.types._
    val ds = starts
      .select(col("doc_id"), col("pos").cast("int").as("pos"))
      .groupBy("doc_id")
      .agg(collect_set(col("pos")).as("starts"))
    def cut(text: org.apache.spark.sql.Column,
        st: org.apache.spark.sql.Column) =
      ColumnBridge.column(StaticInvoke(
        Class.forName("graft.functions.ProfileOps"),
        StructType(Seq(
          StructField("n_tokens", LongType, nullable = false),
          StructField("n_removed", LongType, nullable = false),
          StructField("clean_text", StringType, nullable = false))),
        "cutSpans",
        Seq(ColumnBridge.expression(text), ColumnBridge.expression(st),
          Literal(W)),
        Seq(StringType, ArrayType(IntegerType, containsNull = false),
          IntegerType),
        propagateNull = false))
    // null-text docs drop (the legacy posexplode(split(text)) form
    // silently dropped them; without this filter the left join +
    // propagateNull=false cut would emit them with null fields)
    d.where(col("text").isNotNull)
      .join(ds, Seq("doc_id"), "left")
      .select(col("doc_id"), cut(col("text"), col("starts")).as("r"))
      .select(col("doc_id"),
        col("r.n_tokens").as("n_tokens"),
        col("r.n_removed").as("n_removed"),
        col("r.clean_text").as("clean_text"))
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
