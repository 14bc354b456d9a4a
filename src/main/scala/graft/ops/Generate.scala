package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.crawl.FetchSchedule
import graft.functions.Urls
import graft.schemas.{CrawlRow, GenerateEntry}

/** T1/F4 — the Generator: select the topN due URLs, capped per host,
  * into a new segment's fetchlist (Generator.java:178-643).
  *
  * Declarative plan: eligibility filter (schedule.shouldFetch as a column
  * predicate) → per-host row_number cap → global TakeOrderedAndProject.
  * No per-reducer quota spill files — Spark's topN replaces the
  * reference's multi-segment spill (SURVEY §7.4). */
object Generate {

  final case class Config(
      topN: Long = Long.MaxValue, // generate.topN
      maxPerHost: Int = Int.MaxValue, // generate.max.count
      curTime: Long = 0L,
      segnum: Int = 1)

  /** shouldFetch as a codegen predicate (AbstractFetchSchedule
    * .java:190-203): due now, or fetchTime so remote it gets pulled in. */
  def dueCol(fetchTime: org.apache.spark.sql.Column, curTime: Long,
      maxIntervalSec: Long): org.apache.spark.sql.Column =
    fetchTime <= curTime || fetchTime - curTime > maxIntervalSec * 1000L

  def apply(db: Dataset[CrawlRow], cfg: Config,
      schedule: FetchSchedule): Dataset[GenerateEntry] = {
    val spark: SparkSession = db.sparkSession
    import spark.implicits._
    val due = db.toDF()
      .filter(dueCol(col("datum.fetchTime"), cfg.curTime,
        schedule.cfg.maxInterval.toLong))
      .withColumn("host", Urls.host(col("url")))
      .withColumn("sort_score", col("datum.score"))
    val perHost = Window.partitionBy(col("host"))
      .orderBy(desc("sort_score"), asc("url"))
    val capped = due
      .withColumn("host_rank", row_number().over(perHost))
      .filter(col("host_rank") <= cfg.maxPerHost)
      .orderBy(desc("sort_score"), asc("url"))
      .limit(if (cfg.topN > Int.MaxValue) Int.MaxValue else cfg.topN.toInt)
    capped.select(
      lit(cfg.segnum).as("segnum"),
      col("sort_score").as("sortScore"),
      col("url"),
      col("datum")).as[GenerateEntry]
  }
}
