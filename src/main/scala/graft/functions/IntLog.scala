package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Integer-exact half-bit log2 — the cross-engine-stable substitute
  * for floating log in scoring math (the DSIR discipline, shared by
  * dsir_select, bm25_search, and the multi-query BM25 op).
  *
  * L2(x) = floor(2·log2 x) for x ≥ 1, computed as 2·(bitlen−1) plus a
  * √2-boundary probe: the only float touched is the comparison
  * against √2·2^(bitlen−1), exact for x < 2⁶² in both Spark and
  * DuckDB (same IEEE doubles, same literal). */
object IntLog {

  /** Spark side. */
  def l2(x: Column): Column =
    lit(2L) * (length(bin(x)) - 1) +
      when(x.cast("double") >=
        lit(1.4142135623730951) *
          pow(lit(2.0), (length(bin(x)) - 1).cast("double")), 1L)
        .otherwise(0L)

  /** DuckDB twin of [[l2]] for oracle SQL. */
  def sqlL2(e: String): String = {
    val bl = s"(length(format('{:b}', CAST(($e) AS BIGINT))) - 1)"
    s"""(2 * $bl + CASE WHEN CAST(($e) AS DOUBLE) >=
        1.4142135623730951 * power(2.0, $bl) THEN 1 ELSE 0 END)"""
  }
}
