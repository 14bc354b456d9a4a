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
      curTime = t0, segnum = 5), sched).collect()
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
}
