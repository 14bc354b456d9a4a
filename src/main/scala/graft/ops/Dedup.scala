package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}
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

  /** One row per duplicate (status DB_DUPLICATE), keyed by url.
    *
    * Skew-immune shape: the keeper of each signature group is
    * `min(struct(compare-chain ascending, url))` — a plain aggregate
    * with map-side combine, so a HOT signature (every empty page in a
    * 10^9-row crawldb hashes identically) contributes one partial row
    * per map task instead of concentrating its whole group in one
    * window partition (which AQE cannot split; the signature-keyed
    * JOIN below it CAN split). Struct ordering is lexicographic by
    * field, so the min is exactly the row a
    * `row_number() over (partition by signature order by chain)` would
    * rank 1 — SkewSpec asserts the A/B. */
  def findDuplicates(db: Dataset[CrawlRow]): Dataset[CrawlRow] = {
    val spark: SparkSession = db.sparkSession
    import spark.implicits._
    val candidates = db.toDF().filter(
      (col("datum.status") === CrawlStatus.DB_FETCHED.toInt ||
        col("datum.status") === CrawlStatus.DB_NOTMODIFIED.toInt) &&
        col("datum.signature").isNotNull)
    val decodedLen = length(col("url")) -
      lit(2) * size(split(col("url"), "%", -1)) + lit(2)
    val keyed = candidates
      .withColumn("is_https", col("url").startsWith("https://").cast("int"))
      .withColumn("sort_key", struct(
        // a desc window ranks NaN FIRST (Spark totals NaN as largest),
        // but -NaN = NaN would sort LAST under struct-min — the flag
        // field restores the window's exact NaN placement
        when(isnan(col("datum.score")), lit(0)).otherwise(lit(1)).as("s0"),
        (-col("datum.score")).as("s1"), // score desc
        (-col("datum.fetchTime")).as("s2"), // newer kept
        (-col("is_https")).as("s3"), // https preferred
        decodedLen.as("s4"), // shortest decoded URL
        col("url").as("id"))) // total-order tiebreak
    val keepers = keyed
      .groupBy(col("datum.signature").as("sig"))
      .agg(min(col("sort_key")).as("k"))
      .select(col("sig"), col("k.id").as("keeper_url"))
    keyed
      .join(keepers, col("datum.signature") === col("sig"))
      .filter(col("url") =!= col("keeper_url"))
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
