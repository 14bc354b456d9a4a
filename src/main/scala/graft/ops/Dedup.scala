package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.schemas.{CrawlRow, CrawlStatus}

/** T4/J4 — the deduplication job over the real crawldb
  * (DeduplicationJob.java:121-285): group FETCHED/NOTMODIFIED rows by
  * signature, pick one keeper per group by the configured compare
  * chain, mark the rest DB_DUPLICATE and merge the marks back
  * (StatusUpdateReducer).
  *
  * The reference's pairwise getDuplicate chain maps onto a window sort:
  * score desc → fetchTime desc (newer kept) → https-scheme preferred →
  * shortest decoded URL → url asc (total-order tiebreak the reference
  * leaves to input order). Decoded URL length is computed as
  * len − 2·(#percent escapes) — exact whenever escapes are well-formed,
  * which normalized URLs guarantee. */
object Dedup {

  /** One row per duplicate (status DB_DUPLICATE), keyed by url. */
  def findDuplicates(db: Dataset[CrawlRow]): Dataset[CrawlRow] = {
    val spark: SparkSession = db.sparkSession
    import spark.implicits._
    val candidates = db.toDF().filter(
      (col("datum.status") === CrawlStatus.DB_FETCHED.toInt ||
        col("datum.status") === CrawlStatus.DB_NOTMODIFIED.toInt) &&
        col("datum.signature").isNotNull)
    val decodedLen = length(col("url")) -
      lit(2) * size(split(col("url"), "%", -1)) + lit(2)
    val w = Window.partitionBy(col("datum.signature")).orderBy(
      desc("datum.score"),
      desc("datum.fetchTime"),
      desc("is_https"),
      asc("decoded_len"),
      asc("url"))
    candidates
      .withColumn("is_https", col("url").startsWith("https://").cast("int"))
      .withColumn("decoded_len", decodedLen)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") =!= 1)
      .select(col("url"), col("datum"))
      .as[CrawlRow]
      .map(r => CrawlRow(r.url,
        r.datum.withStatus(CrawlStatus.DB_DUPLICATE)))
  }

  /** Mark + merge back: duplicates override their db row's status
    * (DeduplicationJob.java:251-285 StatusUpdateReducer). */
  def apply(db: Dataset[CrawlRow]): Dataset[CrawlRow] = {
    val spark: SparkSession = db.sparkSession
    import spark.implicits._
    val dups = findDuplicates(db)
    db.union(dups).groupByKey(_.url).mapGroups { (url, it) =>
      val rows = it.toSeq
      val orig = rows.find(_.datum.status != CrawlStatus.DB_DUPLICATE)
        .getOrElse(rows.head)
      val marked = rows.exists(_.datum.status == CrawlStatus.DB_DUPLICATE)
      CrawlRow(url,
        if (marked) orig.datum.withStatus(CrawlStatus.DB_DUPLICATE)
        else orig.datum)
    }
  }
}
