package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Urls
import graft.schemas._
import graft.tables.LinkRow

/** J3/F8 — the indexing cogroup (IndexerMapReduce.java:309-413): crawldb
  * datum ⋈ segment fetch/parse ⋈ linkdb inlinks → one document per URL
  * with an ADD / DELETE / skip action (NutchIndexAction). */
object Index {

  final case class Config(
      deleteGone: Boolean = false, // indexer.delete.gone
      skipNotModified: Boolean = true, // indexer.skip.notmodified
      // index-jexl-filter (JexlIndexingFilter.java:53-102): keep only
      // documents whose JEXL predicate over the assembled doc fields
      // (url, title, host, content, digest, boost, anchors, action)
      // evaluates true. The reference walks a JexlContext per document;
      // here the expression lands in Catalyst via Jexl.toSqlExpr, so the
      // gate is codegen'd and prunable instead of a per-doc script call.
      // A predicate that errors fails the query (vs the reference's
      // warn-and-drop) — surfacing the broken expression beats silently
      // indexing nothing.
      jexlFilter: Option[String] = None)

  final case class Doc(url: String, action: String, title: String,
      host: String, content: String, digest: String, boost: Float,
      anchors: Seq[String])

  def apply(db: Dataset[CrawlRow], fetch: Dataset[CrawlRow],
      parseData: Dataset[ParseDataRow], parseText: Dataset[ParseTextRow],
      linkdb: Dataset[LinkRow], cfg: Config): Dataset[Doc] = {
    val spark: SparkSession = db.sparkSession
    import spark.implicits._
    val d = db.toDF().select(col("url"),
      col("datum.status").as("db_status"),
      col("datum.score").as("score"),
      col("datum.signature").as("signature"))
    val f = fetch.toDF().select(col("url"),
      col("datum.status").as("fetch_status"))
    val pd = parseData.toDF().select(col("url"), col("title"),
      col("parseStatus"))
    val pt = parseText.toDF().select(col("url"), col("text"))
    val lk = linkdb.toDF().select(col("url"),
      expr("transform(inlinks, i -> i.anchor)").as("anchors"))

    val gone = Seq(CrawlStatus.DB_GONE, CrawlStatus.DB_DUPLICATE,
      CrawlStatus.DB_REDIR_PERM, CrawlStatus.DB_REDIR_TEMP,
      CrawlStatus.DB_ORPHAN).map(_.toInt)

    d.join(f, Seq("url"), "left")
      .join(pd, Seq("url"), "left")
      .join(pt, Seq("url"), "left")
      .join(lk, Seq("url"), "left")
      .withColumn("action",
        when(col("db_status").isin(gone: _*),
          if (cfg.deleteGone) lit("delete") else lit("skip"))
          .when(col("db_status") === CrawlStatus.DB_NOTMODIFIED.toInt &&
            cfg.skipNotModified, lit("skip"))
          .when(col("parseStatus").isNull ||
            col("parseStatus") =!= ParseStatusCodes.Success, lit("skip"))
          .otherwise(lit("add")))
      .filter(col("action") =!= "skip")
      .select(col("url"), col("action"),
        coalesce(col("title"), lit("")).as("title"),
        Urls.host(col("url")).as("host"),
        coalesce(col("text"), lit("")).as("content"),
        coalesce(col("signature"), lit("")).as("digest"),
        col("score").as("boost"),
        coalesce(col("anchors"), array()).as("anchors"))
      .transform(df => cfg.jexlFilter.fold(df)(j =>
        df.filter(expr(graft.net.Jexl.toSqlExpr(j)))))
      .as[Doc]
  }
}
