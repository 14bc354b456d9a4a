package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.net.UrlFilter
import graft.functions.Urls
import graft.schemas.{CrawlDatum, CrawlRow, CrawlStatus}

/** S1 + J1/U4 — seed ingestion and inject merge (Injector.java:62-180
  * seed parsing, 299-395 merge rules / NUTCH-1405).
  *
  * Seed lines: `url[\tk=v]...`; `#` comments and blanks skipped;
  * reserved keys nutch.score / nutch.fetchInterval /
  * nutch.fetchInterval.fixed promote to typed fields (FIXTURES §A1).
  */
object Inject {

  final case class Config(
      defaultInterval: Int = 2592000, // db.fetch.interval.default
      scoreInjected: Float = 1.0f, // db.score.injected
      overwrite: Boolean = false, // db.injector.overwrite
      update: Boolean = false) // db.injector.update

  val ScoreKey = "nutch.score"
  val IntervalKey = "nutch.fetchInterval"
  val FixedIntervalKey = "nutch.fetchInterval.fixed"

  /** Parse one seed line to (url, metadata); None for comments/blanks. */
  def parseSeedLine(line: String): Option[(String, Map[String, String])] = {
    val t = line.trim
    if (t.isEmpty || t.startsWith("#")) None
    else {
      val parts = t.split("\t").map(_.trim).filter(_.nonEmpty)
      val meta = parts.drop(1).flatMap { kv =>
        kv.indexOf('=') match {
          case -1 => None
          case i => Some(kv.take(i).trim -> kv.drop(i + 1).trim)
        }
      }.toMap
      Some(parts(0) -> meta)
    }
  }

  /** Seed line → normalized, filtered, typed CrawlRow with status
    * INJECTED (converted to DB_UNFETCHED at merge). */
  def seedToRow(line: String, cfg: Config, filter: UrlFilter,
      now: Long): Option[CrawlRow] =
    parseSeedLine(line).flatMap { case (rawUrl, meta) =>
      Urls.normalize(rawUrl).flatMap(filter.filter).map { url =>
        val score = meta.get(ScoreKey).flatMap(v =>
          scala.util.Try(v.toFloat).toOption).getOrElse(cfg.scoreInjected)
        val interval = meta.get(IntervalKey).flatMap(v =>
          scala.util.Try(v.toInt).toOption).getOrElse(cfg.defaultInterval)
        val fixed = meta.get(FixedIntervalKey)
        val custom = meta -- Seq(ScoreKey, IntervalKey, FixedIntervalKey)
        val withFixed = fixed.fold(custom)(f =>
          custom + (CrawlDatum.FixedIntervalKey -> f))
        CrawlRow(url, CrawlDatum(CrawlStatus.INJECTED, now, 0,
          fixed.flatMap(v => scala.util.Try(v.toInt).toOption)
            .getOrElse(interval),
          score, None, 0L, withFixed))
      }
    }

  /** The inject job: seed lines ∪ existing db → merged db
    * (InjectReducer.reduce rules 1/2/3a/3b). */
  def apply(db: Dataset[CrawlRow], seedLines: Dataset[String], cfg: Config,
      filter: UrlFilter, now: Long): Dataset[CrawlRow] = {
    val spark: SparkSession = db.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast((cfg, filter))
    val seeds = seedLines.flatMap(l => Inject.seedToRow(l, bc.value._1,
      bc.value._2, now))
    db.union(seeds).groupByKey(_.url).mapGroups { (url, it) =>
      var old: Option[CrawlDatum] = None
      var injected: Option[CrawlDatum] = None
      it.foreach { r =>
        if (r.datum.status == CrawlStatus.INJECTED)
          injected = Some(r.datum.withStatus(CrawlStatus.DB_UNFETCHED))
        else old = Some(r.datum)
      }
      val result = (old, injected) match {
        case (None, Some(inj)) => inj // rule 1
        case (Some(o), None) => o // rule 2
        case (Some(_), Some(inj)) if cfg.overwrite => inj // rule 3a
        case (Some(o), Some(inj)) if cfg.update => // rule 3b.ii
          o.copy(
            metadata = o.metadata ++ inj.metadata,
            score = if (inj.score != cfg.scoreInjected) inj.score else o.score,
            fetchInterval =
              if (inj.fetchInterval != cfg.defaultInterval) inj.fetchInterval
              else o.fetchInterval)
        case (Some(o), Some(_)) => o // rule 3b.i
        case (None, None) =>
          throw new IllegalStateException(s"empty group for $url")
      }
      CrawlRow(url, result)
    }
  }
}
