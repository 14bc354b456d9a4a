package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Similarity / near-duplicate primitives: shingling, MinHash, SimHash,
  * fixed-point embedding cosine (BASELINE.json north-star ops;
  * reference analog: scoring-similarity cosine Model.java:40-170).
  *
  * Embedding math uses the fixed-point trick (quantize each float to a
  * long at 1e6, do exact integer dot products, convert to double once at
  * the end) so results are order-independent and engine-exact — see
  * Queries.scala oracle-safety rules.
  */
object Similarity {

  /** Character n-gram set of a string, as an array column (deduped).
    * Guarded for strings shorter than n. */
  def charShingles(text: Column, n: Int): Column =
    when(length(text) >= n,
      array_distinct(transform(
        sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n)))))
      .otherwise(array(text))

  /** Word w-shingles from a whitespace-tokenized string (deduped). */
  def wordShingles(text: Column, w: Int): Column = {
    val t = split(text, " ")
    when(size(t) >= w,
      array_distinct(transform(
        sequence(lit(1), size(t) - (w - 1)),
        i => concat_ws(" ",
          (0 until w).map(o => element_at(t, i + o)): _*))))
      .otherwise(array(concat_ws(" ", t)))
  }

  /** MinHash family: ONE md5 per shingle, then affine rehashes
    * h_i(x) = (a_i·(md5(x) mod P) + b_i) mod P over a 30-bit prime —
    * 12× fewer md5 evaluations than a per-seed md5 family, and the
    * arithmetic is exactly reproducible in the DuckDB oracle. a_i·hb
    * stays < 2^37 so BIGINT math never overflows on either engine. */
  val MinhashP = 1073741789L // largest prime < 2^30

  def minhashA(i: Int): Long = 2L * i + 3
  def minhashB(i: Int): Long = 97L * i + 11

  /** Per-shingle base hash (compute once, before the min-aggs). */
  def minhashBase(shingle: Column): Column =
    Hashing.md5Long(shingle) % MinhashP

  /** MinHash aggregate for family member `i` over the base-hash column. */
  def minhashAgg(base: Column, i: Int): Column =
    min((base * minhashA(i) + minhashB(i)) % MinhashP)

  /** NOTE on a rejected design: computing the whole signature with
    * higher-order array functions (transform + aggregate) avoids the
    * per-shingle shuffle entirely, but Spark evaluates HOF lambdas
    * interpreted — outside whole-stage codegen — and measured 2x slower
    * end-to-end than the explode + min-agg plan, whose min-aggregates
    * are map-side combined (the shuffle moves one pre-aggregated row
    * per doc per partition). Keep the codegen path. */

  /** DuckDB twin of minhashBase/minhashAgg (hb = base-hash SQL expr). */
  def sqlMinhashAgg(hb: String, i: Int): String =
    s"MIN((${minhashA(i)} * $hb + ${minhashB(i)}) % $MinhashP)"

  /** Fixed-point quantization of a float/double to long at 10^6. */
  def fxq(c: Column): Column = round(c * 1e6, 0).cast("long")

  /** Exact integer dot product of two float-array columns (quantized). */
  def dotFx(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => fxq(x) * fxq(y)), lit(0L), _ + _)

  /** Exact integer squared norm of a float-array column (quantized). */
  def normSqFx(a: Column): Column =
    aggregate(transform(a, x => fxq(x) * fxq(x)), lit(0L), _ + _)

  /** Pre-quantized long array — compute once per vector, not per pair. */
  def quantized(a: Column): Column = transform(a, fxq(_))

  /** Dot product of two pre-quantized long arrays. */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0L), _ + _)

  /** Squared norm of a pre-quantized long array. */
  def normSqQ(a: Column): Column =
    aggregate(transform(a, x => x * x), lit(0L), _ + _)

  /** Cosine similarity from the exact integer pieces — one double
    * expression, identical on both engines. */
  def cosineFx(dot: Column, normSqA: Column, normSqB: Column): Column =
    dot.cast("double") /
      (sqrt(normSqA.cast("double")) * sqrt(normSqB.cast("double")))

  /** 60-bit SimHash of whitespace tokens (occurrence-weighted majority
    * vote per bit). Returns a long column expression usable in agg form:
    * caller explodes tokens and bits. Provided here as the per-token hash;
    * the bit loop lives in the query (needs explode). */
  def tokenHash60(token: Column): Column = Hashing.md5Long(token)
}
