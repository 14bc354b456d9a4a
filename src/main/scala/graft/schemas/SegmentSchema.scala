package graft.schemas

/** Segment part schemas (FIXTURES.md §A3; reference: Content.java:49-60,
  * ParseData.java:44-50, ParseText.java:39-48,
  * ParseOutputFormat.java:221-260).
  *
  * A segment is one fetch batch: crawl_generate → crawl_fetch + content →
  * crawl_parse + parse_data + parse_text. Here each part is a typed
  * Dataset; `tables.Segment` persists them as parquet subdirectories of a
  * `yyyyMMddHHmmss`-named segment dir.
  */

/** One fetchlist entry (Generator.java:119-150). */
final case class GenerateEntry(segnum: Int, sortScore: Float, url: String,
    datum: CrawlDatum)

/** Raw fetched content (Content.java:49-60); `base` is the URL after
  * redirects, used for relative-outlink resolution. */
final case class ContentRow(url: String, base: String, bytes: Array[Byte],
    contentType: String, meta: Map[String, String])

final case class Outlink(toUrl: String, anchor: String)

/** Parse result metadata (ParseData.java:44-50). parseStatus: 1 =
  * success, 2 = failed (ParseStatus.java major codes). */
final case class ParseDataRow(url: String, title: String,
    outlinks: Seq[Outlink], parseStatus: Int, parseMeta: Map[String, String])

final case class ParseTextRow(url: String, text: String)

object ParseStatusCodes {
  val Success = 1
  val Failed = 2
}
