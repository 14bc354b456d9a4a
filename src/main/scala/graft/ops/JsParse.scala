package graft.ops

import java.util.regex.Pattern

import graft.schemas.Outlink

/** parse-js analog (JSParseFilter.java:82-265): outlink extraction from
  * JavaScript — quoted string literals that look like URLs, harvested
  * from `<script>` bodies, `on*` event-handler attributes and
  * `javascript:` hrefs (the HtmlParseFilter side), plus standalone .js
  * content parsing (the Parser side: first line as title, script as
  * text). */
object JsParse {

  /** Quoted JS string literals (STRING_PATTERN,
    * JSParseFilter.java:193-195); group 2 is the literal body. */
  private val stringPattern = Pattern.compile(
    "(\\\\*(?:\"|'))([^\\s\"']+?)(?:\\1)",
    Pattern.CASE_INSENSITIVE | Pattern.MULTILINE)

  /** Permissive URL-shape gate (URI_PATTERN,
    * JSParseFilter.java:197-199): something with a dot or slash between
    * non-space runs. */
  private val uriPattern = Pattern.compile(
    "(^|\\s*?)/?\\S+?[/\\.]\\S+($|\\s*)",
    Pattern.CASE_INSENSITIVE | Pattern.MULTILINE)

  private val maxTitleLen = 80

  /** Extract URL-like quoted literals from a JS fragment
    * (getJSLinks, JSParseFilter.java:207-252): `www.`-prefixed literals
    * get `http://`, relative ones resolve against the base, `&amp;`
    * un-escapes; literals failing the URL-shape gate or resolution are
    * dropped. */
  def getJsLinks(plainText: String, anchor: String, base: String)
      : Seq[Outlink] = {
    val out = Vector.newBuilder[Outlink]
    val m = stringPattern.matcher(plainText)
    while (m.find()) {
      val raw = m.group(2)
      if (uriPattern.matcher(raw).matches()) {
        val resolved =
          if (raw.startsWith("www.")) Some("http://" + raw)
          else Html.resolveUrl(base, raw)
        resolved.foreach(u =>
          out += Outlink(u.replaceAll("&amp;", "&"), anchor))
      }
    }
    out.result()
  }

  /** The HtmlParseFilter side (walk, JSParseFilter.java:108-162): scan
    * script element bodies, `on*` event attributes on any element, and
    * `href="javascript:…"` values. Returns JS-discovered outlinks in
    * document order (the caller appends them to the HTML parse's own). */
  def htmlJsLinks(root: Html.HNode, base: String): Seq[Outlink] = {
    val out = Vector.newBuilder[Outlink]
    def walk(n: Html.HNode): Unit = n match {
      case e: Html.HElem =>
        if (e.name == "script") {
          val script = e.children.collect {
            case Html.HText(t) => t
          }.mkString("\n")
          if (script.nonEmpty) out ++= getJsLinks(script, "", base)
        } else {
          e.attrs.foreach { case (name, value) =>
            if (name.startsWith("on"))
              out ++= getJsLinks(value, "", base)
            else if (name == "href" &&
              value.toLowerCase.contains("javascript:"))
              out ++= getJsLinks(value, "", base)
          }
        }
        e.children.foreach(walk)
      case _ => ()
    }
    walk(root)
    out.result()
  }

  /** The standalone .js Parser side (getParse,
    * JSParseFilter.java:171-191): whole script as text, first line
    * (capped at 80 chars) as title. */
  def parseJs(url: String, script: String)
      : (String, String, Seq[Outlink]) = {
    val idx = script.indexOf('\n')
    val title =
      if (idx != -1) script.substring(0, math.min(idx, maxTitleLen))
      else script.substring(0, math.min(maxTitleLen, script.length))
    (title, script, getJsLinks(script, "", url))
  }
}
