package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.crawl.{DefaultFetchSchedule, ScheduleConfig, UpdateDb}
import graft.schemas.CrawlRow

/** J2 — the CrawlDb update state machine as an oracle-checked query
  * (reference: CrawlDbReducer.java:84-355 with DefaultFetchSchedule).
  *
  * The Spark side runs the REAL operator (`UpdateDb.apply`:
  * groupByKey + streaming per-key merge over Dataset[CrawlRow]); the
  * DuckDB oracle re-derives the same Default-schedule transition logic as
  * a SQL CASE cascade. Inputs are crawl-shaped rows derived
  * deterministically from `orders`/`lineitem`:
  *   - old db row exists when k%10≠0 (status 1+(k%6), retries k%4,
  *     signature null when k%3=0 else md5-prefix)
  *   - a fetch row exists when k%4∈{0,3} (status 33+(k%6): SUCCESS,
  *     RETRY, REDIR_TEMP, REDIR_PERM, GONE, NOTMODIFIED; on SUCCESS the
  *     signature equals old's when k%2=0 — exercising the modified /
  *     notmodified signature compare, NUTCH-1341/1422)
  *   - LINKED inlink datums exist when k%5∈{0,2} (score = l_linenumber,
  *     integer-valued so OPIC float accumulation is order-independent)
  * Every branch of the reducer is reachable: orphan passthrough,
  * links-only score bump, new-url initializeSchedule, retry escalation
  * at retryMax, gone interval growth, notmodified via 304 and via
  * signature.
  */
object QueriesUpdateDb {

  private val Now = 1700000000000L
  private val T0 = 1690000000000L

  val updatedbStateMachine = Q(
    "updatedb_state_machine",
    (s, dir) => {
      import s.implicits._
      val o = Queries.t(s, dir, "orders").select(col("o_orderkey").as("k"))
      val li = Queries.t(s, dir, "lineitem")

      val emptyMeta = typedLit(Map.empty[String, String])
      def datum(status: org.apache.spark.sql.Column,
          fetchTime: org.apache.spark.sql.Column,
          retries: org.apache.spark.sql.Column,
          interval: org.apache.spark.sql.Column,
          score: org.apache.spark.sql.Column,
          signature: org.apache.spark.sql.Column,
          modifiedTime: org.apache.spark.sql.Column) =
        struct(status.cast("byte").as("status"),
          fetchTime.cast("long").as("fetchTime"),
          retries.cast("int").as("retries"),
          interval.cast("int").as("fetchInterval"),
          score.cast("float").as("score"),
          signature.cast("string").as("signature"),
          modifiedTime.cast("long").as("modifiedTime"),
          emptyMeta.as("metadata"))

      val oldFt = lit(T0) + (col("k") % 1000) * 3600000L
      val olds = o.filter(col("k") % 10 =!= 0).select(
        col("k").cast("string").as("url"),
        datum(
          lit(1) + col("k") % 6,
          oldFt,
          col("k") % 4,
          lit(2592000),
          (col("k") % 100).cast("double"),
          when(col("k") % 3 === 0, lit(null).cast("string"))
            .otherwise(substring(md5(col("k").cast("string")), 1, 8)),
          oldFt - 5000000L).as("datum"))

      val fetches = o.filter(col("k") % 4 === 0 || col("k") % 4 === 3).select(
        col("k").cast("string").as("url"),
        datum(
          lit(33) + col("k") % 6,
          oldFt + 86400000L,
          when(col("k") % 10 =!= 0, col("k") % 4).otherwise(lit(0)),
          lit(2592000),
          (col("k") % 50).cast("double"),
          when(col("k") % 6 === 0,
            when(col("k") % 2 === 0, substring(md5(col("k").cast("string")), 1, 8))
              .otherwise(substring(md5(concat(lit("x"), col("k").cast("string"))), 1, 8)))
            .otherwise(lit(null).cast("string")),
          lit(0L)).as("datum"))

      val links = li
        .filter(col("l_orderkey") % 5 === 0 || col("l_orderkey") % 5 === 2)
        .select(
          col("l_orderkey").cast("string").as("url"),
          datum(lit(0x43), lit(0L), lit(0), lit(2592000),
            col("l_linenumber").cast("double"),
            lit(null).cast("string"), lit(0L)).as("datum"))

      // SIGNATURE carriers (crawl_parse side): override the fetch's own
      // signature for k%8∈{0,3} — both residues co-occur with a fetch row
      // (k%4∈{0,3}), so the carrier always has a fetch to attach to
      val sigCarriers = o.filter(col("k") % 8 === 0 || col("k") % 8 === 3)
        .select(
          col("k").cast("string").as("url"),
          datum(lit(0x41), lit(0L), lit(0), lit(0),
            lit(0.0),
            substring(md5(concat(lit("s"), col("k").cast("string"))), 1, 8),
            lit(0L)).as("datum"))

      val in = olds.union(fetches).union(links).union(sigCarriers)
        .as[CrawlRow]
      UpdateDb(in, Now, DefaultFetchSchedule(ScheduleConfig()))
        .select(
          col("url"),
          col("datum.status").cast("int").as("status"),
          col("datum.fetchTime").as("fetch_time"),
          col("datum.retries").as("retries"),
          col("datum.fetchInterval").as("interval"),
          col("datum.score").cast("double").as("score"),
          coalesce(col("datum.signature"), lit("")).as("signature"),
          col("datum.modifiedTime").as("modified_time"))
    },
    Some(s"""
      WITH o AS (SELECT o_orderkey AS k FROM orders),
      olds AS (
        SELECT k,
          CAST(1 + (k % 6) AS INTEGER) AS o_status,
          $T0 + (k % 1000) * 3600000 AS o_ft,
          CAST(k % 4 AS INTEGER) AS o_retries,
          CAST(k % 100 AS DOUBLE) AS o_score,
          CASE WHEN k % 3 = 0 THEN NULL
               ELSE substr(md5(CAST(k AS VARCHAR)), 1, 8) END AS o_sig,
          $T0 + (k % 1000) * 3600000 - 5000000 AS o_mt
        FROM o WHERE k % 10 <> 0),
      fetches AS (
        SELECT k,
          CAST(33 + (k % 6) AS INTEGER) AS f_status,
          $T0 + (k % 1000) * 3600000 + 86400000 AS f_ft,
          CAST(CASE WHEN k % 10 <> 0 THEN k % 4 ELSE 0 END AS INTEGER) AS f_retries,
          CAST(k % 50 AS DOUBLE) AS f_score,
          CASE WHEN k % 6 = 0 THEN
            CASE WHEN k % 2 = 0 THEN substr(md5(CAST(k AS VARCHAR)), 1, 8)
                 ELSE substr(md5('x' || CAST(k AS VARCHAR)), 1, 8) END
          END AS f_sig
        FROM o WHERE k % 4 IN (0, 3)),
      links AS (
        SELECT l_orderkey AS k, CAST(SUM(l_linenumber) AS DOUBLE) AS lsum
        FROM lineitem WHERE l_orderkey % 5 IN (0, 2) GROUP BY l_orderkey),
      m AS (
        SELECT COALESCE(olds.k, fetches.k, links.k) AS k,
          olds.k IS NOT NULL AS has_old,
          fetches.k IS NOT NULL AS has_fetch,
          links.k IS NOT NULL AS has_links,
          o_status, o_ft, o_retries, o_score, o_sig, o_mt,
          f_status, f_ft, f_retries, f_score, f_sig,
          COALESCE(lsum, 0.0) AS lsum
        FROM olds
        FULL JOIN fetches ON olds.k = fetches.k
        FULL JOIN links ON COALESCE(olds.k, fetches.k) = links.k),
      sel AS (
        SELECT *,
          -- crawl_parse SIGNATURE carrier overrides the fetch signature
          CASE WHEN k % 8 IN (0, 3)
               THEN substr(md5('s' || CAST(k AS VARCHAR)), 1, 8)
               ELSE f_sig END AS eff_sig
        FROM m),
      sel2 AS (
        SELECT *,
          CASE WHEN has_fetch AND f_status = 38 THEN 2
               WHEN has_fetch AND f_status = 33 AND has_old
                    AND o_sig IS NOT NULL AND eff_sig IS NOT NULL
               THEN CASE WHEN o_sig <> eff_sig THEN 1 ELSE 2 END
               ELSE 0 END AS modif
        FROM sel)
      SELECT CAST(k AS VARCHAR) AS url,
        CASE
          WHEN NOT has_fetch AND NOT has_links THEN o_status
          WHEN NOT has_fetch THEN CASE WHEN has_old THEN o_status ELSE 1 END
          WHEN f_status IN (33, 38) THEN CASE WHEN modif = 2 THEN 6 ELSE 2 END
          WHEN f_status = 35 THEN 4
          WHEN f_status = 36 THEN 5
          WHEN f_status = 34 THEN CASE WHEN f_retries + 1 < 3 THEN 1 ELSE 3 END
          WHEN f_status = 37 THEN 3
        END AS status,
        CASE
          WHEN NOT has_fetch AND NOT has_links THEN o_ft
          WHEN NOT has_fetch THEN CASE WHEN has_old THEN o_ft ELSE $Now END
          WHEN f_status IN (33, 35, 36, 38) THEN f_ft + 2592000000
          WHEN f_status = 34 THEN CASE WHEN f_retries + 1 < 3
            THEN f_ft + 86400000 ELSE f_ft + 3888000000 END
          WHEN f_status = 37 THEN f_ft + 3888000000
        END AS fetch_time,
        CASE
          WHEN NOT has_fetch THEN CASE WHEN has_old THEN o_retries ELSE 0 END
          WHEN f_status IN (33, 35, 36, 38) THEN 0
          WHEN f_status = 34 THEN f_retries + 1
          WHEN f_status = 37 THEN f_retries
        END AS retries,
        CASE
          WHEN NOT has_fetch THEN 2592000
          WHEN f_status = 34 THEN CASE WHEN f_retries + 1 < 3
            THEN 2592000 ELSE 3888000 END
          WHEN f_status = 37 THEN 3888000
          ELSE 2592000
        END AS interval,
        CASE
          WHEN NOT has_fetch AND NOT has_links THEN o_score
          WHEN NOT has_fetch THEN
            (CASE WHEN has_old THEN o_score ELSE 0.0 END) + lsum
          ELSE (CASE WHEN has_old THEN o_score ELSE f_score END) + lsum
        END AS score,
        COALESCE(CASE
          WHEN NOT has_fetch THEN CASE WHEN has_old THEN o_sig END
          WHEN f_status = 33 THEN CASE WHEN modif = 2 THEN o_sig ELSE eff_sig END
          WHEN f_status IN (35, 36) THEN eff_sig
          WHEN f_status IN (34, 37, 38) THEN CASE WHEN has_old THEN o_sig END
        END, '') AS signature,
        CASE
          WHEN NOT has_fetch THEN CASE WHEN has_old THEN o_mt ELSE 0 END
          WHEN f_status = 33 THEN CASE WHEN modif = 2 THEN o_mt ELSE f_ft END
          WHEN f_status = 38 THEN CASE WHEN has_old THEN o_mt ELSE 0 END
          WHEN f_status IN (35, 36) THEN f_ft
          WHEN f_status IN (34, 37) THEN CASE WHEN has_old THEN o_mt ELSE 0 END
        END AS modified_time
      FROM sel2"""))

  val all: Seq[Q] = Seq(updatedbStateMachine)
}
