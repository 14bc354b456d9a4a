package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF (point-in-time) join as a public operator: each left row is
  * enriched with the payload of the LATEST right row at or strictly
  * before its timestamp, per key — the join every feature/attribution
  * pipeline needs and Spark has no native operator for (SURVEY §2.3).
  * NOT a range join (quadratic in rows-per-key and unprunable): the
  * two sides union with a type rank and ONE running latest-payload
  * carry in (ts, rank) order resolves every left row in a single
  * pass.
  *
  * The carry is the two-phase range-split scan
  * ([[PrefixSum.groupedRunningMax]]): rows range-partition by
  * (key, (ts, rank)), so a key owning 90% of the data spans
  * partitions in proportion to its mass instead of serializing in one
  * window task — AQE cannot split a window partition, so the naive
  * per-key window is a straggler BY CONSTRUCTION under hot keys
  * (AsofSkewSpec: max/mean task records 14.4 window vs 2.2 scan under
  * a planted 90% key). Cost: two narrow shuffles instead of one —
  * measured 2.6× the window's WALL constant at sf0.1 local[32]
  * (same-container interleaved A/B, ASOF_AB_r14.json; executor CPU is
  * ~13× — the scan's extra passes burn cores the window doesn't, but
  * they parallelize, which is the point), still linear to ×1000
  * (SCALE_r13_deep). The trade buys worst-case immunity with a
  * constant-factor premium on well-distributed keys; callers with a
  * guaranteed-unskewed key can take the window via the private
  * `enrich(twoPhase = false)` A/B seam.
  *
  * Determinism: right rows are pre-reduced to ONE row per (key, ts) —
  * the max of the payload struct in the given column order — so the
  * as-of value is unique under timestamp collisions on both engines.
  * `strict = true` (default) never matches a right row AT the left
  * row's own timestamp; ties between left rows are harmless (they
  * carry no payload). Null key fields group together, as they do for
  * a window. */
object AsofJoin {

  /** Left enriched with the latest prior right payload. Output = every
    * left column, then each right payload column (null when nothing
    * prior), then the matched right timestamp as `<rightTs>_asof`
    * (null when nothing prior). Payload = right's columns minus keys
    * minus `rightTs`; payload and `<rightTs>_asof` names must be free
    * on the left side. */
  def apply(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      strict: Boolean = true): DataFrame =
    enrich(left, right, keys, leftTs, rightTs, strict, twoPhase = true)

  /** The implementation, with the carry choice exposed for the
    * AsofSkewSpec A/B: `twoPhase = false` is the per-key window
    * phrasing — row-identical, kept ONLY as the A/B oracle (one hot
    * key serializes it). */
  private[graft] def enrich(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      strict: Boolean, twoPhase: Boolean): DataFrame = {
    val payload = right.columns.filterNot(c =>
      keys.contains(c) || c == rightTs).toSeq
    require(payload.nonEmpty,
      "right side needs at least one payload column beyond keys + ts")
    val matchedTs = s"${rightTs}_asof"
    val clash = left.columns.toSet
      .intersect(payload.toSet + matchedTs)
    require(clash.isEmpty,
      s"left already has column(s) the join emits: ${clash.mkString(", ")}")
    val reserved = (left.columns ++ right.columns)
      .filter(_.startsWith("_asof"))
    require(reserved.isEmpty,
      s"_asof* columns are reserved: ${reserved.mkString(", ")}")

    // one right row per (key, ts): max payload struct — deterministic
    // under ts collisions (map-side combinable aggregate)
    val rightR = right.groupBy((keys :+ rightTs).map(col): _*)
      .agg(max(struct(payload.map(col): _*)).as("_asof_p"))
    // type rank: strict → left sorts BEFORE right at equal ts, so an
    // equal-ts right row is never "prior"; non-strict flips the rank
    val (lTr, rTr) = if (strict) (0, 1) else (1, 0)
    val lTagged = left
      .withColumn("_asof_ts", col(leftTs))
      .withColumn("_asof_tr", lit(lTr))
      .withColumn("_asof_l", lit(1))
    val rTagged = rightR.select(
      keys.map(col) ++ Seq(col(rightTs).as("_asof_ts"),
        lit(rTr).as("_asof_tr"), col("_asof_p")): _*)
    val tagged = lTagged.unionByName(rTagged, allowMissingColumns = true)
    // running latest right row: max over (ts, payload) structs — left
    // rows contribute null and are skipped by the aggregate
    val lv: Column = when(col("_asof_l").isNull,
      struct(col("_asof_ts").as("ts"), col("_asof_p").as("p")))
    val groupKey =
      if (keys.length == 1) col(keys.head)
      else struct(keys.map(col): _*)
    val carried =
      if (twoPhase)
        PrefixSum.groupedRunningMax(tagged, groupKey,
          struct(col("_asof_ts"), col("_asof_tr")), lv, "_asof_lv")
      else {
        val w = Window.partitionBy(keys.map(col): _*)
          .orderBy(asc("_asof_ts"), asc("_asof_tr"))
          .rowsBetween(Window.unboundedPreceding, 0)
        tagged.withColumn("_asof_lv", max(lv).over(w))
      }
    carried
      .filter(col("_asof_l") === 1)
      .select(left.columns.map(col) ++
        payload.map(p => col(s"_asof_lv.p.$p").as(p)) :+
        col("_asof_lv.ts").as(matchedTs): _*)
  }
}
