package graft.plugins

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Subcollection tagging (subcollection plugin analog — reference:
  * subcollection/Subcollection.java + SubcollectionIndexingFilter.java):
  * each collection has newline-separated whitelist/blacklist SUBSTRING
  * patterns; a URL belongs to the collection iff no blacklist pattern
  * occurs in it and some whitelist pattern does (blacklist first,
  * Subcollection.filter:184-201). The indexing filter then adds every
  * matching collection id to the document's `subcollection` field.
  */
object Subcollections {

  final case class Subcollection(
      id: String,
      name: String,
      whiteList: Seq[String],
      blackList: Seq[String],
      caseInsensitive: Boolean = false) {

    private def pats(l: Seq[String]): Seq[String] =
      l.map(p => if (caseInsensitive) p.toLowerCase else p)
        .map(_.trim).filter(_.nonEmpty)
    private val white = pats(whiteList)
    private val black = pats(blackList)

    /** Scalar form (Subcollection.filter semantics). */
    def matches(url0: String): Boolean = {
      if (url0 == null) return false
      val url = if (caseInsensitive) url0.toLowerCase else url0
      !black.exists(url.contains) && white.exists(url.contains)
    }

    /** Column form — same semantics compiled to codegen'd contains(). */
    def matchesCol(url0: Column): Column = {
      val url = if (caseInsensitive) lower(url0) else url0
      val noBlack = black.map(p => !url.contains(p))
        .foldLeft(lit(true))(_ && _)
      val anyWhite = white.map(p => url.contains(p))
        .foldLeft(lit(false))(_ || _)
      noBlack && anyWhite
    }
  }

  private val collRe = java.util.regex.Pattern.compile(
    "<subcollection>(.*?)</subcollection>",
    java.util.regex.Pattern.DOTALL)

  private def child(block: String, tag: String): Option[String] = {
    val m = java.util.regex.Pattern
      .compile(s"<$tag>(.*?)</$tag>", java.util.regex.Pattern.DOTALL)
      .matcher(block)
    if (m.find()) Some(m.group(1).trim) else None
  }

  private def lines(s: String): Seq[String] =
    s.split("[\\n\\r]+").map(_.trim).filter(_.nonEmpty).toSeq

  /** Parse the reference's subcollections.xml shape
    * (CollectionManager.parse): <subcollections><subcollection>
    * <id/><name/><whitelist/><blacklist/></subcollection>…</…>. */
  def parse(xml: String, caseInsensitive: Boolean = false): Seq[Subcollection] = {
    val out = Vector.newBuilder[Subcollection]
    val m = collRe.matcher(xml)
    while (m.find()) {
      val b = m.group(1)
      for (id <- child(b, "id"); wl <- child(b, "whitelist"))
        out += Subcollection(id, child(b, "name").getOrElse(id),
          lines(wl), child(b, "blacklist").map(lines).getOrElse(Nil),
          caseInsensitive)
    }
    out.result()
  }

  /** All matching collection ids for a URL column, comma-joined in
    * registration order ('' when none) — the document's `subcollection`
    * index field (SubcollectionIndexingFilter.filter). */
  def tagCol(url: Column, colls: Seq[Subcollection]): Column =
    concat_ws(",", colls.map(c =>
      when(c.matchesCol(url), lit(c.id)).otherwise(lit(null))): _*)

  /** IndexingFilter seam: adds the subcollection field when non-empty. */
  final class SubcollectionIndexingFilter(colls: Seq[Subcollection])
      extends Extensions.IndexingFilter {
    override def filter(doc: Map[String, String], url: String,
        datum: graft.schemas.CrawlDatum): Option[Map[String, String]] = {
      val ids = colls.filter(_.matches(url)).map(_.id)
      Some(if (ids.isEmpty) doc
           else doc + ("subcollection" -> ids.mkString(",")))
    }
  }
}
