package graft.plugins

import java.util.regex.Pattern

import graft.ops.Html

/** HtmlParseFilter-family analogs that enrich parse metadata:
  * microformats-reltag (RelTagParser.java:61-135) and
  * parsefilter-regex (RegexParseFilter.java:58-90). Both are pure
  * scalar passes over the parsed DOM / page text — map-only in a
  * pipeline, no shuffle. */
object ParseFilters {

  /** rel-tag microformat harvest (RelTagParser.Parser:77-135): `<a>`
    * elements carrying BOTH href and rel="tag"; the tag is the
    * URL-decoded last path segment of the href (absolute hrefs only —
    * the reference's `new URL(href)` throws on relative ones and the
    * tag is dropped). Returned sorted + deduped (the reference
    * accumulates into a TreeSet). */
  def relTags(root: Html.HNode): Seq[String] = {
    val tags = scala.collection.mutable.TreeSet.empty[String]
    def walk(n: Html.HNode): Unit = n match {
      case e: Html.HElem =>
        if (e.name == "a") {
          (e.attr("href"), e.attr("rel")) match {
            case (Some(href), Some(rel)) if rel.equalsIgnoreCase("tag") =>
              Normalizers.split(href).foreach { u =>
                val path = u.path
                val seg = path.substring(path.lastIndexOf('/') + 1)
                val tag =
                  try java.net.URLDecoder.decode(seg, "UTF-8")
                  catch { case _: IllegalArgumentException => seg }
                if (tag.nonEmpty) tags += tag
              }
            case _ => ()
          }
        }
        e.children.foreach(walk)
      case _ => ()
    }
    walk(root)
    tags.toSeq
  }

  /** One parsefilter-regex rule: set `field` to "true"/"false" by
    * whether `pattern` finds a match in the raw html or the extracted
    * text (RegexParseFilter.filter:58-90 + rule-file format
    * `field<tab>source<tab>regex`). */
  final case class RegexParseRule(field: String, source: String,
      pattern: Pattern) extends Serializable

  object RegexParseRule {
    /** Rule file: one `field<ws>html|text<ws>regex` per line, '#'
      * comments skipped. */
    def parseRules(text: String): Seq[RegexParseRule] =
      text.linesIterator.map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("#"))
        .flatMap { l =>
          l.split("\\s+", 3) match {
            case Array(field, source, regex)
                if source == "html" || source == "text" =>
              try Some(RegexParseRule(field, source, Pattern.compile(regex)))
              catch {
                case _: java.util.regex.PatternSyntaxException => None
              }
            case _ => None
          }
        }.toSeq
  }

  /** Evaluate the rules: (field, "true"|"false") per rule, in rule
    * order. */
  def regexFlags(html: String, text: String,
      rules: Seq[RegexParseRule]): Seq[(String, String)] =
    rules.map { r =>
      val source = if (r.source == "html") html else text
      r.field -> String.valueOf(r.pattern.matcher(source).find())
    }
}
