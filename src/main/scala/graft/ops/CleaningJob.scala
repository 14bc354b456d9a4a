package graft.ops

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.schemas.{CrawlRow, CrawlStatus}

/** The CleaningJob (CleaningJob.java:1-207): scan the crawldb for
  * documents that must disappear from the index — DB_GONE (404s) and
  * DB_DUPLICATE — and fold the resulting delete actions into the index
  * sinks.
  *
  * The reference pushes deletes through live IndexWriter connections;
  * our sinks are files, so the delete is a compaction: read the sink,
  * anti-join the delete set (a broadcast when small, shuffle join when
  * not — Catalyst/AQE decides), rewrite atomically via tmp-and-swap.
  * One pass per sink, no driver-side row handling. */
object CleaningJob {

  /** The urls whose documents must be removed (DBFilter mapper,
    * CleaningJob.java:66-102: gone + duplicate). */
  def deletes(db: Dataset[CrawlRow]): Dataset[String] = {
    import db.sparkSession.implicits._
    db.filter(r => r.datum.status == CrawlStatus.DB_GONE ||
      r.datum.status == CrawlStatus.DB_DUPLICATE)
      .map(_.url)
  }

  /** `deletes` as Index delete-action docs (NutchIndexAction.DELETE),
    * for sinks that consume action streams. */
  def deleteActions(db: Dataset[CrawlRow]): Dataset[Index.Doc] = {
    import db.sparkSession.implicits._
    deletes(db).map(u => Index.Doc(u, "delete", "",
      graft.net.UrlParts.host(u).getOrElse(""), "", "", 0f, Nil))
  }

  /** Fold deletes into a JSON-lines sink dir (JsonLinesWriter output):
    * every line whose `url` is in the delete set is dropped; `delete`
    * action lines already present are also compacted away. Returns the
    * number of removed lines. */
  def cleanJsonSink(spark: SparkSession, sinkDir: String,
      del: Dataset[String]): Long = {
    import spark.implicits._
    val docs = spark.read.text(sinkDir)
      .withColumn("__url", get_json_object(col("value"), "$.url"))
      .withColumn("__action", get_json_object(col("value"), "$.action"))
    val delDf = del.toDF("__durl")
    val kept = docs
      .join(delDf, docs("__url") === delDf("__durl"), "left_anti")
      .filter(col("__action") =!= "delete" || col("__action").isNull)
      .select("value")
      .cache()
    val total = docs.count()
    val keptN = kept.count()
    val tmp = sinkDir + ".cleaning-tmp"
    kept.write.mode(SaveMode.Overwrite).text(tmp)
    kept.unpersist()
    // atomic-ish swap (same discipline as tables.Install)
    val dir = Paths.get(sinkDir)
    val old = Paths.get(sinkDir + ".cleaning-old")
    if (Files.exists(old)) graft.tables.Install.deleteRecursively(old)
    Files.move(dir, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(tmp), dir, StandardCopyOption.ATOMIC_MOVE)
    graft.tables.Install.deleteRecursively(old)
    total - keptN
  }
}
