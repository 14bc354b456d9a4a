package graft.functions

import java.math.RoundingMode

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Scalar fixed-point vector math over ArrayData, called from
  * whole-stage codegen via StaticInvoke — replaces the
  * `aggregate`/`zip_with`/`transform` higher-order-function forms,
  * which Spark evaluates interpreted (no codegen; see
  * Similarity.shingleCall for the profile that motivated this).
  *
  * Quantization is bit-exact with the column form it replaces:
  * `round(x * 1e6, 0).cast("long")` — Spark's Round on doubles goes
  * through BigDecimal.valueOf(d).setScale(0, HALF_UP), mirrored here,
  * so the DuckDB oracle comparison is unchanged. */
object VecOps {

  /** fxq: quantize one double at 1e6 exactly like the Round expression. */
  def fxq(x: Double): Long =
    java.math.BigDecimal.valueOf(x * 1e6)
      .setScale(0, RoundingMode.HALF_UP).doubleValue().toLong

  /** Float vector → pre-quantized long vector (Similarity.quantized). */
  def quantize(a: ArrayData): ArrayData = {
    if (a == null) return null
    val in = a.toFloatArray()
    val out = new Array[Long](in.length)
    var i = 0
    while (i < in.length) { out(i) = fxq(in(i).toDouble); i += 1 }
    new GenericArrayData(out)
  }

  /** Dot product of two pre-quantized long vectors (Similarity.dotQ).
    * INTENTIONAL divergence from the zip_with form replaced: zip_with
    * pads the shorter array with nulls (result length = max), so the
    * old aggregate returned NULL on length-mismatched vectors; this
    * scalar truncates to the shorter length and returns a number.
    * Embedding vectors are fixed-width in this corpus, so behavior
    * differs only on malformed input — where a defined truncation
    * beats a silent NULL that drops the row from similarity results. */
  def dotQ(a: ArrayData, b: ArrayData): Long = {
    if (a == null || b == null) return 0L
    val xs = a.toLongArray()
    val ys = b.toLongArray()
    val n = math.min(xs.length, ys.length)
    var acc = 0L
    var i = 0
    while (i < n) { acc += xs(i) * ys(i); i += 1 }
    acc
  }

  /** Squared norm of a pre-quantized long vector (Similarity.normSqQ). */
  def normSqQ(a: ArrayData): Long = {
    if (a == null) return 0L
    val xs = a.toLongArray()
    var acc = 0L
    var i = 0
    while (i < xs.length) { acc += xs(i) * xs(i); i += 1 }
    acc
  }

  /** Element-wise difference of two pre-quantized long vectors — the
    * residual rv = v − c of the IVFADC encode path
    * (Similarity.residQ). Codegen twin of
    * `zip_with(a, b, (x, y) => x − y)`, which Spark evaluates
    * interpreted (HigherOrderFunction, no codegen). Same
    * length-mismatch divergence as dotQ: zip_with null-pads to the
    * longer length, this truncates to the shorter — embedding vectors
    * are fixed-width, so behavior differs only on malformed input. */
  def residQ(a: ArrayData, b: ArrayData): ArrayData = {
    if (a == null || b == null) return null
    val xs = a.toLongArray()
    val ys = b.toLongArray()
    val n = math.min(xs.length, ys.length)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = xs(i) - ys(i); i += 1 }
    // primitive array — GenericArrayData(Array[Any]) would box
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** Quantizing dot product of two FLOAT vectors (Similarity.dotFx). */
  def dotFx(a: ArrayData, b: ArrayData): Long = {
    if (a == null || b == null) return 0L
    val xs = a.toFloatArray()
    val ys = b.toFloatArray()
    val n = math.min(xs.length, ys.length)
    var acc = 0L
    var i = 0
    while (i < n) { acc += fxq(xs(i).toDouble) * fxq(ys(i).toDouble); i += 1 }
    acc
  }

  /** Quantizing squared norm of a FLOAT vector (Similarity.normSqFx). */
  def normSqFx(a: ArrayData): Long = {
    if (a == null) return 0L
    val xs = a.toFloatArray()
    var acc = 0L
    var i = 0
    while (i < xs.length) {
      val q = fxq(xs(i).toDouble)
      acc += q * q
      i += 1
    }
    acc
  }
}
