package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Urls
import graft.schemas.ParseDataRow
import graft.tables.{Inlink, LinkRow}

/** J10/U2 — link inversion into the LinkDb (LinkDb.java:149-239,
  * LinkDbMerger.java:92-110).
  *
  * outlink (from → to, anchor) becomes inlink (to ← from); internal
  * (same-host) links are dropped by default (db.ignore.internal.links);
  * per-target inlink lists are bounded (db.max.inlinks) keeping the
  * first `maxInlinks` by (fromUrl) order — deterministic, and the bound
  * is enforced INSIDE the aggregation via a sorted slice, not by
  * collecting unbounded lists. */
object InvertLinks {

  final case class Config(
      maxInlinks: Int = 10000, // db.max.inlinks
      maxAnchorLength: Int = 100, // linkdb.max.anchor.length
      ignoreInternalLinks: Boolean = true) // db.ignore.internal.links

  def apply(parseData: Dataset[ParseDataRow], existing: Dataset[LinkRow],
      cfg: Config): Dataset[LinkRow] = {
    val spark: SparkSession = parseData.sparkSession
    import spark.implicits._
    val edges = parseData.toDF()
      .select(col("url").as("fromUrl"), explode(col("outlinks")).as("o"))
      .select(col("fromUrl"), col("o.toUrl").as("url"),
        substring(col("o.anchor"), 1, cfg.maxAnchorLength).as("anchor"))
    val external =
      if (cfg.ignoreInternalLinks)
        edges.filter(Urls.host(col("fromUrl")) =!= Urls.host(col("url")))
      else edges
    // bounded-state top-k: a hot target URL (millions of inlinks) never
    // holds more than maxInlinks entries in any task's aggregation
    // buffer — see graft.plans.BoundedTopK vs collect_list-then-slice
    val fresh = external
      .groupBy(col("url"))
      .agg(graft.plans.BoundedTopK.boundedSortedList(
        struct(col("fromUrl"), col("anchor")), cfg.maxInlinks)
        .as("inlinks"))
      .as[LinkRow]
    // merge with the existing db: union inlink lists, re-bound
    merge(Seq(fresh, existing), cfg)
  }

  /** U2 LinkDbMerger (LinkDbMerger.java:92-110): union N link dbs,
    * per-url distinct inlinks with the deterministic (fromUrl, anchor)
    * order, re-bounded to maxInlinks. One shuffle on url; per-group
    * state is one url's bounded inlink list. */
  def merge(dbs: Seq[Dataset[LinkRow]], cfg: Config): Dataset[LinkRow] = {
    val spark: SparkSession = dbs.head.sparkSession
    import spark.implicits._
    dbs.reduce(_ union _)
      .groupByKey(_.url)
      .mapGroups { (url, it) =>
        val merged = it.flatMap(_.inlinks).toSeq
          .distinct.sortBy(i => (i.fromUrl, i.anchor)).take(cfg.maxInlinks)
        LinkRow(url, merged)
      }
  }
}
