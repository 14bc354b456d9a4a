package graft.ops

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.schemas.{CrawlDatum, CrawlRow, CrawlStatus => S}

class CrawlDbReaderSpec extends AnyFunSuite with SparkSuite {

  private def db = {
    import spark.implicits._
    def row(u: String, st: Byte, score: Float, ft: Long) =
      CrawlRow(u, CrawlDatum(st, ft, 0, 2592000, score, Some("aa"), 0L,
        Map.empty))
    Seq(
      row("http://a.com/", S.DB_FETCHED, 2.0f, 100L),
      row("http://b.com/", S.DB_FETCHED, 4.0f, 200L),
      row("http://c.com/", S.DB_UNFETCHED, 1.0f, 300L),
      row("http://d.com/", S.DB_GONE, 0.5f, 400L)).toDS()
  }

  test("stats: per-status counts and score stats") {
    val s = CrawlDbReader.stats(db).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    assert(s("db_fetched") == ((2L, 2.0, 4.0)))
    assert(s("db_unfetched")._1 == 1L)
    assert(s("db_gone")._1 == 1L)
  }

  test("csv/json dumps write readable lines") {
    import spark.implicits._
    val out = Files.createTempDirectory("dbr").toString
    CrawlDbReader.dumpCsv(db, s"$out/csv")
    val lines = spark.read.text(s"$out/csv").as[String].collect()
    assert(lines.length == 4)
    assert(lines.exists(_.startsWith("\"http://a.com/\",db_fetched,2.0000,")))
    CrawlDbReader.dumpJson(db, s"$out/json")
    val jl = spark.read.json(s"$out/json")
    assert(jl.count() == 4)
    assert(jl.filter("status = 'db_gone'").count() == 1)
  }

  test("topN is score-descending with a deterministic tiebreak") {
    val top = CrawlDbReader.topN(db, 2).collect().map(_.getString(0))
    assert(top.toSeq == Seq("http://b.com/", "http://a.com/"))
  }

  test("url point lookup") {
    assert(CrawlDbReader.url(db, "http://c.com/")
      .exists(_.datum.status == S.DB_UNFETCHED))
    assert(CrawlDbReader.url(db, "http://nope.com/").isEmpty)
  }
}
