package graft.functions

import java.math.RoundingMode

import org.apache.spark.sql.catalyst.util.ArrayData

/** Scalar statistics over a sorted (v, c) value histogram — an
  * `array<struct<v: double, c: long>>` built by
  * `Relational.valueHistogram` — called from whole-stage codegen via
  * StaticInvoke. Replaces the `aggregate(...)` higher-order-function
  * forms, which Spark evaluates interpreted and re-walks once per
  * output column: crawldb_stats derives eight columns from the same
  * histogram, and at sf0.1 a status group's histogram holds ~50k
  * entries, so the interpreted form paid 8 interpreted O(n) lambda
  * walks per group (9.4 s at sf0.01 under an honest bench action; the
  * old count() action had pruned the columns away and hidden it).
  *
  * Arithmetic is bit-exact with the column forms replaced (same
  * accumulation order, same Round-via-BigDecimal quantization, same
  * lo·(1−f)+hi·f interpolation), so the DuckDB oracle comparison is
  * unchanged. Histograms are non-empty by construction — a group only
  * exists because rows exist.
  */
object HistOps {

  /** Row count of the group: Σ c. */
  def histN(h: ArrayData): Long = {
    if (h == null) return 0L
    var acc = 0L
    var i = 0
    val n = h.numElements()
    while (i < n) { acc += h.getStruct(i, 2).getLong(1); i += 1 }
    acc
  }

  /** Order-independent fixed-point sum: Σ round(v·10^scale)·c, scaled
    * back to double — the same value as Queries.fxSum over raw rows.
    * Quantization mirrors Spark's Round on doubles:
    * BigDecimal.valueOf(d).setScale(0, HALF_UP). */
  def histFxSum(h: ArrayData, scale: Int): Double = {
    if (h == null) return 0.0
    val pow = math.pow(10, scale)
    var acc = 0L
    var i = 0
    val n = h.numElements()
    while (i < n) {
      val row = h.getStruct(i, 2)
      val q = java.math.BigDecimal.valueOf(row.getDouble(0) * pow)
        .setScale(0, RoundingMode.HALF_UP).doubleValue().toLong
      acc += q * row.getLong(1)
      i += 1
    }
    acc.toDouble / pow
  }

  /** Exact linear-interpolated quantile (quantile_cont semantics) over
    * the sorted histogram: pos = (n−1)·q, lo = value at rank ⌊pos⌋,
    * hi = value at rank ⌊pos⌋+1, result lo·(1−frac)+hi·frac — the
    * identical double arithmetic of the column form it replaces, so
    * results stay bit-identical to DuckDB's quantile_cont under the
    * same rounding. */
  def histQuantileCont(h: ArrayData, q: Double): Double = {
    if (h == null) return Double.NaN
    val total = histN(h)
    val pos = (total - 1).toDouble * q
    val k = math.floor(pos)
    val frac = pos - k
    var lo = Double.NaN
    var hasLo = false
    var hi = Double.NaN
    var hasHi = false
    var cum = 0L
    var i = 0
    val n = h.numElements()
    while (i < n && !hasHi) {
      val row = h.getStruct(i, 2)
      cum += row.getLong(1)
      if (!hasLo && k < cum) { lo = row.getDouble(0); hasLo = true }
      if (!hasHi && k + 1 < cum) { hi = row.getDouble(0); hasHi = true }
      i += 1
    }
    if (frac == 0.0 || !hasHi) lo
    else lo * (1.0 - frac) + hi * frac
  }
}
