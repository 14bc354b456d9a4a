package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Live fetch-health counters from the Publisher event log — the
  * streaming twin of the batch [[graft.ops.Metrics]] fetcher group,
  * and the consumer end of the reference's publisher→broker→monitor
  * pipeline (publish-rabbitmq feeding a dashboard): fetch tasks emit
  * START/END/REPORT events through
  * [[graft.plugins.Publishers.FileLogPublisher]] (one sealed segment
  * per task), and this stream tails the directory into per-minute
  * outcome counts by event type and status.
  *
  * Watermarked tumbling windows bound the state (horizon/minute ×
  * distinct (type,status) pairs); at cluster scale the same transform
  * runs unchanged over a Kafka source — only the readStream line
  * differs, which is why the event schema is the bean-JSON the
  * reference's ObjectMapper writes. */
object MetricsStream {

  private val eventSchema = StructType(Seq(
    StructField("eventType", StringType),
    StructField("eventData", MapType(StringType, StringType)),
    StructField("url", StringType),
    StructField("timestamp", LongType)))

  /** Parse a (streaming or batch) Dataset of event-JSON lines. */
  def parse(lines: DataFrame): DataFrame =
    lines
      .select(from_json(col("value"), eventSchema).as("e"))
      .where(col("e").isNotNull)
      .select(col("e.eventType").as("event_type"),
        coalesce(col("e.eventData").getItem("status"), lit(""))
          .as("status"),
        col("e.url").as("url"),
        timestamp_millis(col("e.timestamp")).as("ts"))

  /** Tail a FileLogPublisher directory into per-minute counters. */
  def fetchCounters(spark: SparkSession, dir: String): DataFrame =
    counters(parse(spark.readStream.text(s"$dir/*.log")))

  /** The windowed aggregation, exposed for batch A/B and tests. */
  def counters(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"),
        col("status"))
      .agg(count(lit(1)).as("n"),
        approx_count_distinct(col("url")).as("n_urls"))
      .select(unix_timestamp(col("window.start")).as("minute_epoch"),
        col("event_type"), col("status"), col("n"), col("n_urls"))
}
