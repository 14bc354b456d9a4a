package graft.ops

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.schemas._
import graft.tables.Segment

class SegmentMergeDedupSpec extends AnyFunSuite with SparkSuite {

  private def fetchRow(u: String, ft: Long, score: Float = 1f,
      st: Byte = CrawlStatus.FETCH_SUCCESS) =
    CrawlRow(u, CrawlDatum(st, ft, 0, 2592000, score, None, 0L, Map.empty))

  test("segment merge: later segment wins per url, per part") {
    import spark.implicits._
    val root = Files.createTempDirectory("segmerge").toString
    val s1 = new Segment(spark, s"$root/s1")
    val s2 = new Segment(spark, s"$root/s2")
    val out = new Segment(spark, s"$root/out")

    s1.writeFetch(Seq(fetchRow("u1", 100), fetchRow("u2", 100)).toDS())
    s2.writeFetch(Seq(fetchRow("u2", 200), fetchRow("u3", 200)).toDS())
    s1.writeContent(Seq(ContentRow("u1", "u1", "old".getBytes, "text/html",
      Map.empty), ContentRow("u2", "u2", "old".getBytes, "text/html",
      Map.empty)).toDS())
    s2.writeContent(Seq(ContentRow("u2", "u2", "new".getBytes, "text/html",
      Map.empty)).toDS())
    s1.writeParseData(Seq(ParseDataRow("u1", "t1-old", Nil, 1, Map.empty),
      ParseDataRow("u2", "t2-old", Nil, 1, Map.empty)).toDS())
    s2.writeParseData(Seq(ParseDataRow("u2", "t2-new", Nil, 1,
      Map.empty)).toDS())
    s1.writeParseText(Seq(ParseTextRow("u1", "one"),
      ParseTextRow("u2", "two-old")).toDS())
    s2.writeParseText(Seq(ParseTextRow("u2", "two-new")).toDS())
    s1.writeCrawlParse(Seq(
      CrawlRow("u2", CrawlDatum(CrawlStatus.SIGNATURE, 0L, 0, 0, 0f,
        Some("oldsig"), 0L, Map.empty))).toDS())
    s2.writeCrawlParse(Seq(
      CrawlRow("u2", CrawlDatum(CrawlStatus.SIGNATURE, 0L, 0, 0, 0f,
        Some("newsig"), 0L, Map.empty))).toDS())

    SegmentMergerOp(spark, Seq(s1, s2), out)

    val f = out.fetch.collect().map(r => r.url -> r.datum.fetchTime).toMap
    assert(f == Map("u1" -> 100L, "u2" -> 200L, "u3" -> 200L))
    assert(new String(out.content.collect()
      .find(_.url == "u2").get.bytes) == "new")
    assert(out.parseData.collect().find(_.url == "u2").get.title == "t2-new")
    assert(out.parseText.collect().find(_.url == "u2").get.text == "two-new")
    val sigs = out.crawlParse.collect().filter(_.url == "u2")
      .flatMap(_.datum.signature)
    assert(sigs.toSeq == Seq("newsig")) // superseded segment's rows dropped
  }

  test("dedup: keeper by (score desc, fetchTime desc), merge-back marks") {
    import spark.implicits._
    def row(u: String, score: Float, ft: Long, sig: String) =
      CrawlRow(u, CrawlDatum(CrawlStatus.DB_FETCHED, ft, 0, 2592000, score,
        Some(sig), 0L, Map.empty))
    val db = Seq(
      row("http://a.com/x", 2f, 100, "s1"),
      row("http://a.com/y", 2f, 200, "s1"), // newer → keeper of s1
      row("http://b.com/z", 1f, 100, "s1"), // lower score → duplicate
      row("http://c.com/", 5f, 100, "s2"), // alone in its group
      CrawlRow("http://unf.com/", CrawlDatum(CrawlStatus.DB_UNFETCHED, 0L,
        0, 2592000, 0f, None, 0L, Map.empty))) // no signature → untouched
      .toDS()

    val dups = Dedup.findDuplicates(db).collect().map(_.url).toSet
    assert(dups == Set("http://a.com/x", "http://b.com/z"))

    val merged = Dedup(db).collect().map(r => r.url -> r.datum.status).toMap
    assert(merged("http://a.com/y") == CrawlStatus.DB_FETCHED)
    assert(merged("http://a.com/x") == CrawlStatus.DB_DUPLICATE)
    assert(merged("http://b.com/z") == CrawlStatus.DB_DUPLICATE)
    assert(merged("http://c.com/") == CrawlStatus.DB_FETCHED)
    assert(merged("http://unf.com/") == CrawlStatus.DB_UNFETCHED)
  }

  test("dedup: https preferred, then shorter decoded url") {
    import spark.implicits._
    def row(u: String, sig: String) =
      CrawlRow(u, CrawlDatum(CrawlStatus.DB_FETCHED, 100L, 0, 2592000, 1f,
        Some(sig), 0L, Map.empty))
    val db = Seq(
      row("http://a.com/page", "s"),
      row("https://a.com/page", "s"), // https preferred (NUTCH httpsOverHttp)
      row("http://a.com/p%20g", "t"),
      row("http://a.com/pg", "t")) // shorter decoded length wins
      .toDS()
    val dups = Dedup.findDuplicates(db).collect().map(_.url).toSet
    assert(dups == Set("http://a.com/page", "http://a.com/p%20g"))
  }
}
