package graft.ops

import java.util.regex.Pattern

import graft.functions.HttpDates

/** RSS 2.0 / Atom 1.0 feed parsing (parse-feed plugin analog —
  * reference: feed/FeedParser.java, which delegates to ROME and emits one
  * sub-parse PER ITEM keyed by the item link, with title+description as
  * the text and published date / author in the parse metadata).
  *
  * Hand-rolled (offline build — no ROME): block-scans item/entry
  * elements, handles CDATA sections and entity-encoded payloads through
  * Html.decodeEntities, RFC-822 dates (RSS pubDate) through HttpDates
  * and W3C/ISO dates (Atom updated/published, RSS dc:date) through
  * Sitemap.parseW3cDate.
  */
object Feed {

  final case class FeedItem(
      feedTitle: String,
      feedLink: String,
      url: String,
      title: String,
      author: String,
      publishedMs: Option[Long],
      text: String)

  private def re(p: String): Pattern =
    Pattern.compile(p, Pattern.CASE_INSENSITIVE | Pattern.DOTALL)

  private val itemRe = re("<item[\\s>].*?</item>|<item/>")
  private val entryRe = re("<entry[\\s>].*?</entry>")
  // element text: <name ...>payload</name>
  private def elemRe(name: String): Pattern =
    re(s"<$name(?:\\s[^>]*)?>(.*?)</$name>")
  private val titleRe = elemRe("title")
  private val linkRe = elemRe("link")
  private val descRe = elemRe("description")
  private val summaryRe = elemRe("summary")
  private val contentRe = elemRe("content")
  private val pubDateRe = elemRe("pubDate")
  private val dcDateRe = elemRe("dc:date")
  private val updatedRe = elemRe("updated")
  private val publishedRe = elemRe("published")
  private val authorRe = elemRe("author")
  private val dcCreatorRe = elemRe("dc:creator")
  private val nameRe = elemRe("name")
  // Atom link: href attribute form, rel=alternate (or unstated) wins
  private val atomLinkRe =
    re("<link\\b[^>]*\\bhref\\s*=\\s*\"([^\"]*)\"[^>]*/?>")
  private val relRe = re("\\brel\\s*=\\s*\"([^\"]*)\"")
  private val cdataRe = re("<!\\[CDATA\\[(.*?)\\]\\]>")

  private def first(p: Pattern, s: String): Option[String] = {
    val m = p.matcher(s)
    if (m.find()) Some(m.group(1)) else None
  }

  /** CDATA unwrap + entity decode + whitespace trim of an element body. */
  private def textOf(raw: String): String = {
    val m = cdataRe.matcher(raw)
    val unwrapped =
      if (m.find()) m.group(1)
      else Html.decodeEntities(raw)
    unwrapped.trim
  }

  private def parseDate(block: String): Option[Long] =
    first(pubDateRe, block).flatMap(s => HttpDates.parse(s.trim))
      .orElse(first(publishedRe, block)
        .flatMap(s => Sitemap.parseW3cDate(s.trim)))
      .orElse(first(updatedRe, block)
        .flatMap(s => Sitemap.parseW3cDate(s.trim)))
      .orElse(first(dcDateRe, block)
        .flatMap(s => Sitemap.parseW3cDate(s.trim)))

  /** Atom <link> resolution: first rel="alternate", else first
    * rel-less link, else any link. */
  private def atomLink(block: String): Option[String] = {
    val m = atomLinkRe.matcher(block)
    var best: Option[(Int, String)] = None // (priority, href) lower wins
    while (m.find()) {
      val tag = m.group(0)
      val href = m.group(1)
      val prio = first(relRe, tag) match {
        case Some(r) if r.equalsIgnoreCase("alternate") => 0
        case None => 1
        case _ => 2
      }
      if (best.forall(_._1 > prio)) best = Some((prio, href))
    }
    best.map(_._2)
  }

  /** Parse an RSS 2.0 or Atom document into its items. Item link is the
    * sub-parse key (FeedParser.java keys each item's parse by its link);
    * linkless items are dropped, like the reference's addToMap guard. */
  def parseFeed(xml: String): Seq[FeedItem] = {
    if (xml == null) return Nil
    val isAtom =
      xml.contains("http://www.w3.org/2005/Atom") ||
        (!xml.toLowerCase.contains("<rss") && entryRe.matcher(xml).find())
    // channel/feed header = everything before the first item/entry
    val firstItem = {
      val m = (if (isAtom) entryRe else itemRe).matcher(xml)
      if (m.find()) m.start() else xml.length
    }
    val head = xml.substring(0, firstItem)
    val feedTitle = first(titleRe, head).map(textOf).getOrElse("")
    val feedLink =
      if (isAtom) atomLink(head).map(Html.decodeEntities).getOrElse("")
      else first(linkRe, head).map(textOf).getOrElse("")
    val blocks = {
      val out = Vector.newBuilder[String]
      val m = (if (isAtom) entryRe else itemRe).matcher(xml)
      while (m.find()) out += m.group(0)
      out.result()
    }
    blocks.flatMap { block =>
      val link =
        if (isAtom) atomLink(block).map(Html.decodeEntities)
        else first(linkRe, block).map(textOf)
      link.filter(_.nonEmpty).map { url =>
        val title = first(titleRe, block).map(textOf).getOrElse("")
        val author =
          first(dcCreatorRe, block).map(textOf)
            .orElse(
              if (isAtom)
                first(authorRe, block).flatMap(a => first(nameRe, a))
                  .map(textOf)
              else first(authorRe, block).map(textOf))
            .getOrElse("")
        val body =
          (if (isAtom)
             first(summaryRe, block).orElse(first(contentRe, block))
           else first(descRe, block))
            .map(textOf).getOrElse("")
        // FeedParser text = title + description
        val text = Seq(title, body).filter(_.nonEmpty).mkString(" ")
        FeedItem(feedTitle, feedLink, url, title, author,
          parseDate(block), text)
      }
    }
  }
}
