package graft.crawl

import graft.schemas.CrawlDatum

/** Reducer-side scoring hooks (reference: ScoringFilter.java — the three
  * methods CrawlDbReducer calls; OPIC impl semantics from
  * scoring-opic/OPICScoringFilter.java:76-108).
  *
  * Pure: every hook returns a new datum instead of mutating.
  */
trait ScoringFilter extends Serializable {
  /** Score of a page first seen via inject (OPICScoringFilter.java:76-78). */
  def injectedScore(d: CrawlDatum): CrawlDatum = d

  /** Score of a page first discovered via an outlink
    * (OPICScoringFilter.java:85-88). */
  def initialScore(d: CrawlDatum): CrawlDatum = d

  /** Score of a page seen this round with neither fetch data nor inlinks. */
  def orphanedScore(d: CrawlDatum): CrawlDatum = d

  /** Merge-time score update given the previous db row and this round's
    * inlink datums (OPICScoringFilter.java:99-108). */
  def updateDbScore(old: Option[CrawlDatum], result: CrawlDatum,
      inlinked: Seq[CrawlDatum]): CrawlDatum = result
}

/** No scoring plugin configured. */
object NoopScoring extends ScoringFilter

/** OPIC: new pages start at 0, inlink cash accumulates onto the old score
  * (OPICScoringFilter.java:85-88, 99-108). */
object OpicScoring extends ScoringFilter {
  override def initialScore(d: CrawlDatum): CrawlDatum = d.copy(score = 0.0f)

  override def updateDbScore(old: Option[CrawlDatum], result: CrawlDatum,
      inlinked: Seq[CrawlDatum]): CrawlDatum = {
    var adjust = 0.0f
    inlinked.foreach(l => adjust += l.score)
    result.copy(score = old.getOrElse(result).score + adjust)
  }
}
