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
      segnum: Int = 1,
      maxNumSegments: Int = 1) // generate.max.num.segments

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
    val limit = (if (cfg.topN > Int.MaxValue) Int.MaxValue.toLong
      else cfg.topN) * cfg.maxNumSegments
    val capped = due
      .withColumn("host_rank", row_number().over(perHost))
      .filter(col("host_rank") <= cfg.maxPerHost)
      .orderBy(desc("sort_score"), asc("url"))
      .limit(if (limit > Int.MaxValue) Int.MaxValue else limit.toInt)
    // multi-segment spill (T6, generate.max.num.segments): topN-sized
    // slices fill consecutive segments — the Spark form of the
    // reference's per-reducer segment quota (Generator.java:486-628)
    val seg =
      if (cfg.maxNumSegments <= 1) lit(cfg.segnum)
      else {
        val wAll = Window.orderBy(desc("sort_score"), asc("url"))
        (floor((row_number().over(wAll) - 1) / cfg.topN) + cfg.segnum)
          .cast("int")
      }
    capped.select(
      seg.as("segnum"),
      col("sort_score").as("sortScore"),
      col("url"),
      col("datum")).as[GenerateEntry]
  }
}
