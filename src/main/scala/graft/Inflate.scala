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
        // length-preserving per-replica alphabet: every vowel maps to a
        // replica-keyed letter. 'a'/'e' are keyed by rep mod 26 and
        // 'i'/'o'/'u' by rep div 26, so the 5-char map determines the
        // pair (rep mod 26, rep div 26) — INJECTIVE for every rep <
        // 676 (a single affine formula is not: 7·rep ≡ 7·(rep mod 26)
        // (mod 26), which collapsed reps {0,33,66,99} to one map). A
        // shingle survives across replicas only if it contains no
        // vowel at all — so shingle/signature spaces are disjoint and
        // near-dup candidate pairs scale ×n, never ×n²
        keyed.withColumn("text", expr(
          "translate(text, 'aeiou', concat(" +
            (0 until 5).map { j =>
              val key = if (j < 2) "rep % 26" else "rep div 26"
              s"char(97 + ($key + $j * 11) % 26)"
            }.mkString(", ") + "))"))
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
