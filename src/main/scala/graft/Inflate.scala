package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-plan table inflation for the scale probe (`graft.ScaleProbe`).
  *
  * `apply(df, name, n)` replicates every fact-table row `n` times —
  * `explode(sequence(0, n-1))` — and REMAPS the keys so cardinalities
  * scale the way a genuinely larger crawl would, instead of the way
  * naive replication would:
  *
  *   - Join keys (`o_orderkey`/`l_orderkey`, `*_custkey`, `*_partkey`,
  *     `*_suppkey`, `doc_id`, `vec_id`, `event_id`, `user_id`) become
  *     `key * n + rep`: each original join pair yields n pairs (linear),
  *     not n² (the naive-replication blowup), and distinct-key counts
  *     scale ×n so group-by output cardinality scales too.
  *   - Dimension tables (`region`, `nation`) and low-cardinality
  *     attributes (nationkey, status flags, lang, source) stay fixed —
  *     at 100 TB you have more orders per nation, not more nations.
  *     Group-bys on them scale group SIZE, which partial aggregation
  *     absorbs map-side.
  *   - `documents.text` gets a size-preserving per-replica letter
  *     substitution (`e`/`a` → replica-keyed letters, 676 combinations)
  *     so each replica lives in a DISJOINT shingle space: dedup /
  *     MinHash / Jaccard candidate pairs scale ×n (within-replica
  *     structure preserved), never ×n² (the all-replicas-are-duplicates
  *     degeneracy replication would plant).
  *   - `part.p_name` (the signature-dedup stand-in) gets a `#rep`
  *     suffix for the same reason: signature groups multiply, they
  *     don't deepen.
  *   - `embeddings.embedding` is perturbed per replica (deterministic
  *     sin noise keyed by the remapped id) so cosine near-dup pairs
  *     don't explode quadratically across identical replicas.
  *
  * The parquet scan stays base-sized; only the post-scan plan sees ×n
  * rows — exactly what a shuffle-growth probe wants to measure.
  */
object Inflate {

  /** Tables that stay fixed under inflation. */
  private val dims = Set("region", "nation")

  /** Key columns remapped `k * n + rep` per table. */
  private val keyCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  def apply(df: DataFrame, name: String, n: Int): DataFrame = {
    if (n <= 1 || dims.contains(name)) return df
    val exploded = df.withColumn("rep",
      explode(sequence(lit(0), lit(n - 1))))
    val keyed = keyCols.getOrElse(name, Nil).foldLeft(exploded) {
      case (d, k) =>
        d.withColumn(k, (col(k).cast("long") * n + col("rep"))
          .cast(df.schema(k).dataType))
    }
    val shaped = name match {
      case "documents" =>
        // EXACT cross-replica shingle disjointness WITHOUT workload
        // distortion: every word gets a replica-keyed prefix — the
        // base-26 digits of rep, exactly as many as n needs — so every
        // word n-gram (n ≥ 1), line, and signature differs across
        // replicas by construction and dedup candidate pairs scale ×n,
        // never ×n². Token COUNT is unchanged (unlike marker-token
        // insertion, which doubled it and quadrupled ngram_jaccard's
        // cost), so per-replica workloads match the base corpus;
        // letter-substitution alphabets were rejected twice in review
        // (26 letters per class cannot distinguish >26 replicas).
        // n_chars is recomputed so the metadata stays truthful.
        val width = math.max(1,
          math.ceil(math.log(n) / math.log(26)).toInt)
        val prefix = concat((width - 1 to 0 by -1).map(i =>
          expr(s"char(97 + (rep div ${math.pow(26, i).toLong}) % 26)")): _*)
        keyed
          .withColumn("text", regexp_replace(col("text"), lit("(^| )"),
            concat(lit("$1"), prefix)))
          .withColumn("n_chars", length(col("text")).cast("long"))
      case "part" =>
        keyed.withColumn("p_name",
          concat(col("p_name"), lit("#"), col("rep")))
      case "embeddings" =>
        keyed.withColumn("embedding", expr(
          "transform(embedding, (x, i) -> " +
            "x + cast(0.3 * sin(vec_id * 31 + i * 7 + 13) as float))"))
      case _ => keyed
    }
    shaped.drop("rep")
  }
}
