package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import Queries.t
import graft.functions.Similarity

/** Batch 5 — similarity search over the `embeddings` table
  * (Array[Float] 64-dim vectors; BASELINE.json north-star ops).
  *
  * All cosine math uses exact fixed-point integer dot products
  * (Similarity.dotFx) so Spark and DuckDB agree bit-for-bit. Vectors are
  * quantized and norm'd ONCE per row (not per pair) — at 100 TB the
  * pairwise stage touches only pre-computed long arrays.
  */
object QueriesEmbed {

  private def sqlDotFx(a: String, b: String): String =
    s"""CAST(list_sum(list_transform(list_zip($a, $b),
        s -> CAST(ROUND(s[1]*1e6) AS BIGINT) * CAST(ROUND(s[2]*1e6) AS BIGINT)))
        AS BIGINT)"""

  private def sqlNormSqFx(a: String): String =
    s"""CAST(list_sum(list_transform($a,
        x -> CAST(ROUND(x*1e6) AS BIGINT) * CAST(ROUND(x*1e6) AS BIGINT)))
        AS BIGINT)"""

  /** embeddings with pre-quantized vector + exact squared norm. */
  private def prepared(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings").select(
      col("vec_id"), col("label"),
      Similarity.quantized(col("embedding")).as("qv"))
      .withColumn("nsq", Similarity.normSqQ(col("qv")))

  private def cosExpr = round(
    Similarity.cosineFx(col("dot"), col("nq"), col("nc")), 6)

  /** Brute-force cosine top-k: every 50th vector is a query, scored
    * against all candidates — the correctness baseline for ANN. */
  val knnBruteforce = Q(
    "knn_bruteforce",
    (s, dir) => {
      val e = prepared(s, dir)
      val q = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("q_id"), col("qv").as("q_qv"),
          col("nsq").as("nq"))
      val pairs = q.join(e, col("q_id") =!= col("vec_id"))
        .select(col("q_id"), col("vec_id").as("cand_id"),
          Similarity.dotQ(col("q_qv"), col("qv")).as("dot"),
          col("nq"), col("nsq").as("nc"))
        .withColumn("cos", cosExpr)
      val w = Window.partitionBy(col("q_id"))
        .orderBy(desc("cos"), asc("cand_id"))
      pairs.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("q_id"), col("cand_id"), col("cos"),
          col("rn").cast("long").as("rank"))
    },
    Some(s"""
      WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
                 FROM embeddings WHERE vec_id % 50 = 0),
      p AS (SELECT q_id, e.vec_id AS cand_id,
              ROUND(CAST(${sqlDotFx("q_emb", "e.embedding")} AS DOUBLE) /
                (sqrt(CAST(${sqlNormSqFx("q_emb")} AS DOUBLE)) *
                 sqrt(CAST(${sqlNormSqFx("e.embedding")} AS DOUBLE))), 6) AS cos
            FROM q, embeddings e WHERE e.vec_id <> q.q_id),
      r AS (SELECT q_id, cand_id, cos,
              row_number() OVER (PARTITION BY q_id
                                 ORDER BY cos DESC, cand_id) AS rn
            FROM p)
      SELECT q_id, cand_id, cos, CAST(rn AS BIGINT) AS rank
      FROM r WHERE rn <= 5"""))

  /** IVF-style pruned ANN: the `label` column acts as the coarse
    * quantizer cell; queries only scan their own cell — the scale path
    * (cell-local scan ≈ nprobe=1 IVF). */
  val knnIvf = Q(
    "knn_ivf",
    (s, dir) => {
      val e = prepared(s, dir)
      val q = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("q_id"), col("qv").as("q_qv"),
          col("nsq").as("nq"), col("label").as("q_label"))
      val pairs = q.join(e,
          col("q_label") === col("label") && col("q_id") =!= col("vec_id"))
        .select(col("q_id"), col("vec_id").as("cand_id"), col("label"),
          Similarity.dotQ(col("q_qv"), col("qv")).as("dot"),
          col("nq"), col("nsq").as("nc"))
        .withColumn("cos", cosExpr)
      val w = Window.partitionBy(col("q_id"))
        .orderBy(desc("cos"), asc("cand_id"))
      pairs.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("q_id"), col("cand_id"),
          col("label").cast("int").as("label"), col("cos"))
    },
    Some(s"""
      WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb, label AS q_label
                 FROM embeddings WHERE vec_id % 50 = 0),
      p AS (SELECT q_id, e.vec_id AS cand_id, e.label,
              ROUND(CAST(${sqlDotFx("q_emb", "e.embedding")} AS DOUBLE) /
                (sqrt(CAST(${sqlNormSqFx("q_emb")} AS DOUBLE)) *
                 sqrt(CAST(${sqlNormSqFx("e.embedding")} AS DOUBLE))), 6) AS cos
            FROM q JOIN embeddings e
              ON e.label = q.q_label AND e.vec_id <> q.q_id),
      r AS (SELECT q_id, cand_id, label, cos,
              row_number() OVER (PARTITION BY q_id
                                 ORDER BY cos DESC, cand_id) AS rn
            FROM p)
      SELECT q_id, cand_id, label, cos FROM r WHERE rn <= 3"""))

  /** Embedding-cosine near-duplicate detection: all pairs within a label
    * cell above a cosine threshold (cell blocking bounds the join). */
  val embedNearDup = Q(
    "embed_neardup",
    (s, dir) => {
      val e = prepared(s, dir)
      val a = e.select(col("vec_id").as("a_id"), col("qv").as("qa"),
        col("nsq").as("nq"), col("label"))
      val b = e.select(col("vec_id").as("b_id"), col("qv").as("qb"),
        col("nsq").as("nc"), col("label").as("label_b"))
      a.join(b, col("label") === col("label_b") && col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          Similarity.dotQ(col("qa"), col("qb")).as("dot"),
          col("nq"), col("nc"))
        .withColumn("cos", cosExpr)
        .filter(col("cos") >= 0.9)
        .select(col("a_id"), col("b_id"), col("cos"))
    },
    Some(s"""
      SELECT a_id, b_id, cos FROM (
        SELECT a.vec_id AS a_id, b.vec_id AS b_id,
          ROUND(CAST(${sqlDotFx("a.embedding", "b.embedding")} AS DOUBLE) /
            (sqrt(CAST(${sqlNormSqFx("a.embedding")} AS DOUBLE)) *
             sqrt(CAST(${sqlNormSqFx("b.embedding")} AS DOUBLE))), 6) AS cos
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id)
      WHERE cos >= 0.9"""))

  val all: Seq[Q] = Seq(knnBruteforce, knnIvf, embedNearDup)
}
