package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.IntLog
import graft.plans.BoundedTopK

/** Multi-query BM25 ranked retrieval — the general form of the
  * `bm25_search` board query (r14 brought the scoring native; r15
  * parameterizes it to the surface a retrieval user actually brings:
  * N arbitrary query strings, ranked in ONE pass over the corpus).
  * The reference delegates this entirely to Solr/ES
  * (`/root/reference/src/java/org/apache/nutch/indexer` ships
  * documents out; searching happens off-engine).
  *
  * Scoring is the integer-exact Robertson/Spärck Jones BM25 of
  * `bm25_search` (k1 = 1.2, b = 0.75): idf in half-bit units via
  * [[IntLog.l2]], tf normalization cleared of fractions by
  * multiplying through by 10·avgdl, one integer division per term,
  * summed over the query's DISTINCT terms.
  *
  * Scale shape (the part that must survive 100 TB):
  *  - ONE token explode over the corpus feeds document length, term
  *    tf, and df — all map-side-combinable counts keyed on doc_id or
  *    term;
  *  - the query table is broadcast everywhere it appears (a query
  *    workload is KB–MB; the corpus is the big side and shuffles only
  *    keyed on doc_id);
  *  - per-query top-k is the O(k) [[BoundedTopK.boundedSortedList]]
  *    aggregate — no global sort, no per-query window, and a hot
  *    query matching a billion documents still holds k rows of state
  *    per task.
  */
object Bm25 {

  /** (query_id, doc_id, score_bp, n_matched) for every document
    * sharing ≥1 term with each query. `docs` needs (doc_id, text) with
    * doc_id unique per row (document length is computed row-locally,
    * not re-aggregated); `queries` needs (query_id, text). */
  def scores(docs: DataFrame, queries: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) >= 1)
    // r16: dl row-locally (nonEmptyTokens scalar) instead of a second
    // corpus tokenize + per-doc count shuffle — `> 0` keeps the legacy
    // explode-drop row set (empty/all-space/null texts), so n_docs and
    // avgdl are unchanged
    val dl = docs.select(col("doc_id"),
        graft.functions.Similarity.nonEmptyTokens(col("text")).as("dl"))
      .where(col("dl") > 0)
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      expr("sum(dl) div count(1)").as("avgdl"))
    // one contribution per DISTINCT query term (classic BM25; a user
    // repeating a word in the query box does not double its weight)
    val qterms = queries.select(col("query_id"),
        explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) >= 1)
      .distinct()
    val terms = qterms.select("w").distinct()
    val tf = toks.join(broadcast(terms), "w")
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy("w").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfq), "w")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("w"),
        ((IntLog.l2(lit(2L) * col("n_docs") - lit(2L) * col("df") + 1L) -
          IntLog.l2(lit(2L) * col("df") + 1L)) *
          expr("""(22 * tf * avgdl * 10000)
                  div (10 * tf * avgdl + 3 * avgdl + 9 * dl)"""))
          .as("ts"))
      .join(broadcast(qterms), "w")
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("ts")).as("score_bp"),
        count(lit(1)).as("n_matched"))
  }

  /** Per-query top-k: (query_id, rank, doc_id, score_bp, n_matched),
    * rank 1..k by (score_bp DESC, doc_id ASC). The (neg, doc_id)
    * struct prefix is a total order, so the O(k) bounded aggregate's
    * ascending "k smallest" IS the descending top-k, ties broken
    * identically in both engines. */
  def rank(docs: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"bm25 top-k needs k > 0, got $k")
    scores(docs, queries)
      .groupBy("query_id")
      .agg(BoundedTopK.boundedSortedList(
        struct((-col("score_bp")).as("neg"), col("doc_id"),
          col("score_bp"), col("n_matched")), k).as("top"))
      .select(col("query_id"),
        posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"),
        (col("pos") + 1).cast("int").as("rank"),
        col("t.doc_id").as("doc_id"),
        col("t.score_bp").as("score_bp"),
        col("t.n_matched").as("n_matched"))
  }
}
