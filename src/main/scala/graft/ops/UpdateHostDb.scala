package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Urls
import graft.schemas.{CrawlRow, CrawlStatus}

/** J8 — UpdateHostDb over the real crawldb
  * (UpdateHostDbJob / UpdateHostDbReducer.java:176-349): per-host
  * status census from the crawldb, FULL-OUTER merged onto the previous
  * hostdb; failure counters carry forward, lastCheck refreshes when the
  * host was seen this round. DNS checking itself is a fetch-side
  * effect; its outcome is the carried counter. */
object UpdateHostDb {

  final case class HostRow(host: String, unfetched: Long, fetched: Long,
      gone: Long, redirTemp: Long, redirPerm: Long, notModified: Long,
      dnsFailures: Long, connectionFailures: Long, score: Double,
      lastCheck: Long)

  def apply(db: Dataset[CrawlRow], prev: Dataset[HostRow],
      now: Long): Dataset[HostRow] = {
    val spark: SparkSession = db.sparkSession
    import spark.implicits._
    def cnt(st: Byte) =
      count(when(col("datum.status") === st.toInt, 1)).as(
        CrawlStatus.name(st))
    val cur = db.toDF()
      .withColumn("host", Urls.host(col("url")))
      .filter(col("host") =!= "")
      .groupBy("host")
      .agg(cnt(CrawlStatus.DB_UNFETCHED), cnt(CrawlStatus.DB_FETCHED),
        cnt(CrawlStatus.DB_GONE), cnt(CrawlStatus.DB_REDIR_TEMP),
        cnt(CrawlStatus.DB_REDIR_PERM), cnt(CrawlStatus.DB_NOTMODIFIED),
        sum(col("datum.score")).cast("double").as("sum_score"))
    val p = prev.toDF().select(col("host"),
      col("dnsFailures").as("prev_dns"),
      col("connectionFailures").as("prev_conn"),
      col("score").as("prev_score"),
      col("lastCheck").as("prev_check"))
    cur.join(p, Seq("host"), "full_outer")
      .select(col("host"),
        coalesce(col("db_unfetched"), lit(0L)).as("unfetched"),
        coalesce(col("db_fetched"), lit(0L)).as("fetched"),
        coalesce(col("db_gone"), lit(0L)).as("gone"),
        coalesce(col("db_redir_temp"), lit(0L)).as("redirTemp"),
        coalesce(col("db_redir_perm"), lit(0L)).as("redirPerm"),
        coalesce(col("db_notmodified"), lit(0L)).as("notModified"),
        coalesce(col("prev_dns"), lit(0L)).as("dnsFailures"),
        coalesce(col("prev_conn"), lit(0L)).as("connectionFailures"),
        coalesce(col("sum_score"), col("prev_score"), lit(0.0)).as("score"),
        when(col("sum_score").isNotNull, lit(now))
          .otherwise(coalesce(col("prev_check"), lit(0L))).as("lastCheck"))
      .as[HostRow]
  }
}
