package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.schemas._
import graft.tables.Segment

/** U3/J7 — segment merge over the real segment tables
  * (SegmentMerger.java:419-530): union every part of N segments, keep
  * per URL the row from the most recent segment (segment order = the
  * caller's list order, later = newer), each part independently. The
  * crawl_parse part is NOT latest-wins collapsed: its SIGNATURE/LINKED/
  * PARSE_META rows are many-per-url by design — rows from superseded
  * segments are dropped wholesale instead (the reference filters by the
  * kept slice). */
object SegmentMergerOp {

  private def latestPerUrl[T](parts: Seq[Dataset[T]]): Dataset[T] = {
    val spark = parts.head.sparkSession
    import spark.implicits._
    val tagged = parts.zipWithIndex
      .map { case (ds, i) => ds.toDF().withColumn("__seg", lit(i)) }
      .reduce(_ unionByName _)
    val w = Window.partitionBy(col("url")).orderBy(desc("__seg"))
    tagged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__seg", "__rn")
      .as[T](parts.head.encoder)
  }

  /** Per-url winning segment index across the fetch parts. */
  private def winningSeg(fetches: Seq[Dataset[CrawlRow]])
      : org.apache.spark.sql.DataFrame = {
    val spark = fetches.head.sparkSession
    val tagged = fetches.zipWithIndex
      .map { case (ds, i) =>
        ds.toDF().select(col("url"), lit(i).as("__seg"))
      }
      .reduce(_ unionByName _)
    tagged.groupBy("url").agg(max("__seg").as("__winseg"))
  }

  /** Merge segments into `out` (later list entries win). */
  def apply(spark: SparkSession, segments: Seq[Segment],
      out: Segment): Unit = {
    import spark.implicits._
    require(segments.nonEmpty)
    out.writeFetch(latestPerUrl(segments.map(_.fetch)))
    out.writeContent(latestPerUrl(segments.map(_.content)))
    out.writeParseData(latestPerUrl(segments.map(_.parseData)))
    out.writeParseText(latestPerUrl(segments.map(_.parseText)))
    // crawl_parse: keep all rows of each url's winning segment
    val wins = winningSeg(segments.map(_.fetch))
    val cp = segments.zipWithIndex.map { case (s, i) =>
      s.crawlParse.toDF().withColumn("__seg", lit(i))
    }.reduce(_ unionByName _)
    val kept = cp.join(wins, Seq("url"), "left")
      .filter(col("__winseg").isNull || col("__seg") === col("__winseg"))
      .drop("__seg", "__winseg")
      .as[CrawlRow]
    out.writeCrawlParse(kept)
  }
}
