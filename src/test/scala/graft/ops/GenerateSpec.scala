package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.crawl.{DefaultFetchSchedule, ScheduleConfig}
import graft.schemas.{CrawlDatum, CrawlRow, CrawlStatus => S}

class GenerateSpec extends AnyFunSuite with SparkSuite {

  private val sched = DefaultFetchSchedule(ScheduleConfig())
  private val t0 = 1700000000000L

  private def db = {
    import spark.implicits._
    (1 to 10).map { i =>
      CrawlRow(s"http://h${i % 3}.com/p$i",
        CrawlDatum(S.DB_UNFETCHED, t0 - i, 0, 2592000, i.toFloat, None, 0L,
          Map.empty))
    }.toDS()
  }

  test("topN + per-host cap") {
    val fl = Generate(db, Generate.Config(topN = 4, maxPerHost = 2,
      curTime = t0), sched).collect()
    assert(fl.length == 4)
    // highest scores win, at most 2 per host
    assert(fl.map(_.datum.score).sorted.reverse.head == 10f)
    assert(fl.groupBy(e => e.url.split('/')(2)).values.forall(_.length <= 2))
  }

  test("multi-segment spill fills consecutive topN-sized segments") {
    val fl = Generate(db, Generate.Config(topN = 3, maxNumSegments = 2,
      curTime = t0, segnum = 5, numSelectors = 1), sched).collect()
    assert(fl.length == 6) // topN * maxNumSegments
    val bySeg = fl.groupBy(_.segnum)
    assert(bySeg.keySet == Set(5, 6))
    assert(bySeg(5).length == 3 && bySeg(6).length == 3)
    // segment 5 holds the higher scores
    assert(bySeg(5).map(_.datum.score).min >= bySeg(6).map(_.datum.score).max)
  }

  test("not-yet-due urls are excluded") {
    val fl = Generate(db, Generate.Config(curTime = t0 - 100), sched)
      .collect()
    // rows have fetchTime t0-1 .. t0-10; due when fetchTime <= t0-100 → none
    assert(fl.isEmpty)
  }

  test("multi-segment spill with many selectors fills per-bucket quotas") {
    // reference shape: limit = topN/numSelectors per bucket per segment
    val fl = Generate(db, Generate.Config(topN = 6, maxNumSegments = 2,
      curTime = t0, numSelectors = 3), sched).collect()
    // localLimit = 2 per bucket per segment; hosts hash into ≤3 buckets,
    // so each bucket contributes ≤2 rows to seg 1 and ≤2 to seg 2
    assert(fl.nonEmpty && fl.forall(e => e.segnum == 1 || e.segnum == 2))
    val perBucketSeg = fl.groupBy(e =>
      (math.floorMod(graft.functions.Hashing.md5LongOf(
        e.url.split('/')(2)), 3), e.segnum))
    assert(perBucketSeg.values.forall(_.length <= 2), perBucketSeg)
  }

  private def hostdb = {
    import spark.implicits._
    Seq(
      UpdateHostDb.HostRow("h0.com", 10, 400, 0, 0, 0, 0, 0, 3, 1.0, t0),
      UpdateHostDb.HostRow("h1.com", 10, 100, 0, 0, 0, 0, 0, 0, 1.0, t0)
    ).toDS() // h2.com absent → default cap applies
  }

  test("hostdb JEXL maxCount override caps per host (J9)") {
    // maxCount = 1 + fetched/200 → h0: round(3.0)=3, h1: round(1.5)=2,
    // h2 (no hostdb row): default maxPerHost
    val fl = Generate(db, Generate.Config(maxPerHost = 1, curTime = t0,
      maxCountExpr = Some("1 + fetched / 200")), sched,
      hostDb = Some(hostdb)).collect()
    val byHost = fl.groupBy(_.url.split('/')(2)).map { case (h, es) =>
      h -> es.length }
    assert(byHost("h0.com") == 3, byHost)
    assert(byHost("h1.com") == 2, byHost)
    assert(byHost("h2.com") == 1, byHost) // default maxPerHost = 1
  }

  test("hostdb JEXL fetchDelay lands in datum metadata (J9)") {
    val fl = Generate(db, Generate.Config(curTime = t0,
      fetchDelayExpr = Some("1000 * (1 + connectionFailures)")), sched,
      hostDb = Some(hostdb)).collect()
    val byHost = fl.groupBy(_.url.split('/')(2))
    assert(byHost("h0.com").forall(
      _.datum.metadata(Generate.VariableFetchDelayKey) == "4000"))
    assert(byHost("h1.com").forall(
      _.datum.metadata(Generate.VariableFetchDelayKey) == "1000"))
    assert(byHost("h2.com").forall( // no hostdb row → no stamp
      !_.datum.metadata.contains(Generate.VariableFetchDelayKey)))
  }

  test("_ngt_ marker: overlapping generates don't re-emit in-flight urls") {
    import spark.implicits._
    val fl1 = Generate(db, Generate.Config(curTime = t0), sched)
    val marked = Generate.markGenerated(db, fl1, t0)
    assert(marked.collect().forall(
      _.datum.metadata(graft.schemas.CrawlDatum.GenerateTimeKey) ==
        t0.toString))
    // second generate within genDelay: nothing due
    val fl2 = Generate(marked, Generate.Config(curTime = t0 + 1000), sched)
    assert(fl2.collect().isEmpty)
    // after genDelay expires the urls come back
    val fl3 = Generate(marked, Generate.Config(
      curTime = t0 + 8L * 24 * 3600 * 1000), sched)
    assert(fl3.collect().length == 10)
  }
}
