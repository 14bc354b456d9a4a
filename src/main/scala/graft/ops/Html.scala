package graft.ops

import scala.collection.mutable.ArrayBuffer

import graft.schemas.Outlink

/** X8 — hand-rolled HTML tokenizer, lenient tree builder, and DOM
  * content utilities.
  *
  * Extraction semantics follow the reference's parse-html plugin
  * (DOMContentUtils.java:46-496) and are conformance-tested against its
  * TestDOMContentUtils.java answer tables (HtmlSpec). The tokenizer is
  * an original HTML5-flavored state machine — real tag/attribute
  * parsing (quoted, single-quoted, unquoted, boolean attrs), comments,
  * CDATA, doctype/PI skipping, raw-text script/style handling, RCDATA
  * title with entity decoding, void elements, and the implied-end-tag
  * rules real-web markup depends on (li closes li, a closes a, td/tr
  * cell closing) — hand-written because the build is offline: no
  * NekoHTML/TagSoup/jsoup on the classpath, and regex extraction is
  * wrong on malformed real-web pages (text inside script/style,
  * unquoted attributes, comments).
  */
object Html {

  sealed trait HNode
  final case class HText(text: String) extends HNode
  final case class HComment(text: String) extends HNode
  final class HElem(val name: String, val attrs: List[(String, String)])
      extends HNode {
    val children = ArrayBuffer.empty[HNode]
    def attr(k: String): Option[String] =
      attrs.collectFirst { case (n, v) if n == k => v }
  }

  // ---------------------------------------------------------------- //
  //  Tokenizer + tree builder                                        //
  // ---------------------------------------------------------------- //

  private val voidTags = Set(
    "area", "base", "br", "col", "embed", "frame", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr")
  /** Content is character data until the matching close tag. */
  private val rawTextTags = Set("script", "style", "textarea", "title", "xmp")
  /** Raw-text elements whose content still decodes entities (RCDATA). */
  private val rcdataTags = Set("textarea", "title")

  private val namedEntities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "copy" -> "©",
    "reg" -> "®", "trade" -> "™", "mdash" -> "—",
    "ndash" -> "–", "hellip" -> "…", "laquo" -> "«",
    "raquo" -> "»", "ldquo" -> "“", "rdquo" -> "”",
    "lsquo" -> "‘", "rsquo" -> "’", "middot" -> "·",
    "bull" -> "•", "deg" -> "°", "plusmn" -> "±",
    "frac12" -> "½", "times" -> "×", "divide" -> "÷",
    "szlig" -> "ß", "agrave" -> "à", "aacute" -> "á",
    "eacute" -> "é", "egrave" -> "è", "uuml" -> "ü",
    "ouml" -> "ö", "auml" -> "ä", "ccedil" -> "ç",
    "euro" -> "€", "pound" -> "£", "yen" -> "¥",
    "cent" -> "¢", "sect" -> "§", "para" -> "¶",
    "shy" -> "­")

  /** Decode &named; &#NNN; &#xHH; references; malformed ampersands stay
    * literal (HTML error recovery, not XML strictness). */
  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        val decoded =
          if (semi > i && semi - i <= 10) {
            val body = s.substring(i + 1, semi)
            if (body.startsWith("#x") || body.startsWith("#X"))
              try Some(new String(Character.toChars(
                Integer.parseInt(body.substring(2), 16))))
              catch { case _: Exception => None }
            else if (body.startsWith("#"))
              try Some(new String(Character.toChars(
                Integer.parseInt(body.substring(1)))))
              catch { case _: Exception => None }
            else namedEntities.get(body.toLowerCase)
          } else None
        decoded match {
          case Some(d) => sb.append(d); i = semi + 1
          case None => sb.append(c); i += 1
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def isNameChar(c: Char): Boolean =
    c.isLetterOrDigit || c == '-' || c == '_' || c == ':' || c == '.'

  private def indexOfIgnoreCase(s: String, sub: String, from: Int): Int = {
    var i = math.max(from, 0)
    val last = s.length - sub.length
    while (i <= last) {
      if (s.regionMatches(true, i, sub, 0, sub.length)) return i
      i += 1
    }
    -1
  }

  /** Position of the real close tag of a raw-text element: `</name`
    * counts only when followed by '>', '/', whitespace, or EOF — the
    * HTML5 script-data rule; `</scriptfoo` inside JS must NOT end the
    * element. */
  private def rawTextCloseAt(s: String, name: String, from: Int): Int = {
    val tag = "</" + name
    var i = from
    while (i >= 0) {
      val idx = indexOfIgnoreCase(s, tag, i)
      if (idx == -1) return -1
      val after = idx + tag.length
      if (after >= s.length) return idx
      val c = s.charAt(after)
      if (c == '>' || c == '/' || c.isWhitespace) return idx
      i = idx + 1
    }
    -1
  }

  /** Parse an HTML string into a tree under a synthetic `#root`. Never
    * throws: unterminated constructs run to EOF, stray end tags are
    * dropped, unclosed elements close implicitly at EOF. */
  def parse(html: String): HElem = {
    val root = new HElem("#root", Nil)
    val stack = ArrayBuffer[HElem](root)
    val n = html.length
    val text = new StringBuilder

    def cur: HElem = stack(stack.length - 1)
    def flushText(): Unit =
      if (text.nonEmpty) {
        cur.children += HText(decodeEntities(text.toString)); text.clear()
      }
    /** Pop to (and including) the nearest open `target`, scanning down
      * from the top; stop without popping at any barrier element. */
    def closeNearest(targets: Set[String], barriers: Set[String]): Unit = {
      var idx = stack.length - 1
      while (idx > 0) {
        val nm = stack(idx).name
        if (targets.contains(nm)) { stack.takeInPlace(idx); return }
        if (barriers.contains(nm)) return
        idx -= 1
      }
    }
    /** The implied-end-tag rules this markup corpus needs: a new list
      * item / cell / anchor closes the one still open. */
    def impliedEnds(name: String): Unit = name match {
      case "li" => closeNearest(Set("li"), Set("ul", "ol"))
      case "dd" | "dt" => closeNearest(Set("dd", "dt"), Set("dl"))
      case "a" => closeNearest(Set("a"), Set.empty)
      case "p" => closeNearest(Set("p"), Set.empty)
      case "tr" => closeNearest(Set("tr", "td", "th"), Set("table"))
      case "td" | "th" => closeNearest(Set("td", "th"), Set("tr", "table"))
      case "option" => closeNearest(Set("option"), Set("select"))
      case _ => ()
    }
    def endTag(name: String): Unit =
      if (!voidTags.contains(name)) {
        val idx = stack.lastIndexWhere(_.name == name)
        if (idx > 0) stack.takeInPlace(idx)
      }

    /** Parse a start tag beginning at `start` (the '<'). Returns the
      * index to continue from. */
    def startTag(start: Int): Int = {
      var j = start + 1
      while (j < n && isNameChar(html.charAt(j))) j += 1
      val name = html.substring(start + 1, j).toLowerCase
      var attrs = List.newBuilder[(String, String)]
      val seen = scala.collection.mutable.HashSet.empty[String]
      var selfClose = false
      var done = false
      while (!done && j < n) {
        while (j < n && html.charAt(j).isWhitespace) j += 1
        if (j >= n) done = true
        else html.charAt(j) match {
          case '>' => j += 1; done = true
          case '/' =>
            if (j + 1 < n && html.charAt(j + 1) == '>') {
              selfClose = true; j += 2; done = true
            } else j += 1
          case _ =>
            val a0 = j
            while (j < n && !html.charAt(j).isWhitespace &&
                html.charAt(j) != '=' && html.charAt(j) != '>' &&
                html.charAt(j) != '/') j += 1
            val aname = html.substring(a0, j).toLowerCase
            if (aname.isEmpty) j += 1
            else {
              while (j < n && html.charAt(j).isWhitespace) j += 1
              var value = ""
              if (j < n && html.charAt(j) == '=') {
                j += 1
                while (j < n && html.charAt(j).isWhitespace) j += 1
                if (j < n) html.charAt(j) match {
                  case q @ ('"' | '\'') =>
                    val v0 = j + 1
                    val close = html.indexOf(q, v0)
                    if (close == -1) { value = html.substring(v0); j = n }
                    else { value = html.substring(v0, close); j = close + 1 }
                  case _ =>
                    val v0 = j
                    while (j < n && !html.charAt(j).isWhitespace &&
                        html.charAt(j) != '>') j += 1
                    value = html.substring(v0, j)
                }
              }
              if (seen.add(aname)) // first occurrence wins, DOM-style
                attrs += aname -> decodeEntities(value)
            }
        }
      }
      impliedEnds(name)
      val e = new HElem(name, attrs.result())
      cur.children += e
      val isVoid = voidTags.contains(name)
      if (!selfClose && !isVoid) stack += e
      if (!selfClose && !isVoid && rawTextTags.contains(name)) {
        // raw-text content: everything until the matching close tag
        val close = rawTextCloseAt(html, name, j)
        val raw = if (close == -1) html.substring(j)
          else html.substring(j, close)
        if (raw.nonEmpty)
          e.children += HText(
            if (rcdataTags.contains(name)) decodeEntities(raw) else raw)
        if (close == -1) n else close // main loop consumes the end tag
      } else j
    }

    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c1 = html.charAt(i + 1)
        if (c1 == '!') {
          flushText()
          if (html.startsWith("<!--", i)) {
            val end = html.indexOf("-->", i + 4)
            cur.children += HComment(
              if (end == -1) html.substring(i + 4)
              else html.substring(i + 4, end))
            i = if (end == -1) n else end + 3
          } else if (html.regionMatches(true, i, "<![CDATA[", 0, 9)) {
            val end = html.indexOf("]]>", i + 9)
            i = if (end == -1) n else end + 3
          } else { // doctype or bogus markup declaration
            val end = html.indexOf('>', i)
            i = if (end == -1) n else end + 1
          }
        } else if (c1 == '?') { // processing instruction
          flushText()
          val end = html.indexOf('>', i)
          i = if (end == -1) n else end + 1
        } else if (c1 == '/') {
          if (i + 2 < n && html.charAt(i + 2).isLetter) {
            flushText()
            var j = i + 2
            while (j < n && isNameChar(html.charAt(j))) j += 1
            val name = html.substring(i + 2, j).toLowerCase
            val gt = html.indexOf('>', j)
            i = if (gt == -1) n else gt + 1
            endTag(name)
          } else { text.append(c); i += 1 }
        } else if (c1.isLetter) {
          flushText()
          i = startTag(i)
        } else { text.append(c); i += 1 }
      } else { text.append(c); i += 1 }
    }
    flushText()
    root
  }

  // ---------------------------------------------------------------- //
  //  DOM content utilities (DOMContentUtils.java semantics)          //
  // ---------------------------------------------------------------- //

  private val wsRe = java.util.regex.Pattern.compile("\\s+")
  private val nofollowRe =
    java.util.regex.Pattern.compile("(?i)\\bnofollow\\b")

  /** Visible text beneath `node`: per-text-node whitespace collapse,
    * single-space joins, script/style subtrees and comments skipped
    * (DOMContentUtils.getTextHelper:154-203). With
    * `abortOnNestedAnchors`, collection stops at the second `a` on the
    * walk — the root itself counts, as in the reference. */
  def getText(node: HNode, abortOnNestedAnchors: Boolean = false): String = {
    val sb = new StringBuilder
    var anchorDepth = 0
    var abort = false
    def walk(h: HNode): Unit = {
      if (abort) return
      h match {
        case HText(t) =>
          val c = wsRe.matcher(t).replaceAll(" ").trim
          if (c.nonEmpty) {
            if (sb.nonEmpty) sb.append(' ')
            sb.append(c)
          }
        case _: HComment => ()
        case e: HElem =>
          if (e.name != "script" && e.name != "style") {
            if (abortOnNestedAnchors && e.name == "a") {
              anchorDepth += 1
              if (anchorDepth > 1) { abort = true; return }
            }
            e.children.foreach(walk)
          }
      }
    }
    walk(node)
    sb.toString
  }

  /** parsefilter-debug support (DebugParseFilter.java:46-54 serializes
    * the DOM via DomUtil.saveDom): render the parsed tree back to
    * markup so a reader can inspect how the tokenizer interpreted a
    * document — attribute order and quoting normalized, text re-escaped,
    * comments preserved, void elements without close tags, the
    * synthetic `#root` wrapper elided. */
  def renderDom(node: HNode): String = {
    val sb = new StringBuilder
    def esc(s: String): String = s.replace("&", "&amp;")
      .replace("<", "&lt;").replace(">", "&gt;")
    def walk(h: HNode): Unit = h match {
      case HText(t) => sb.append(esc(t))
      case HComment(t) => sb.append("<!--").append(t).append("-->")
      case e: HElem =>
        val isRoot = e.name == "#root"
        if (!isRoot) {
          sb.append('<').append(e.name)
          e.attrs.foreach { case (k, v) =>
            sb.append(' ').append(k).append("=\"")
              .append(esc(v).replace("\"", "&quot;")).append('"')
          }
          sb.append('>')
        }
        if (isRoot || !voidTags.contains(e.name)) {
          // raw-text content (script/style) was captured verbatim and
          // must re-emit verbatim — escaping would corrupt the code
          if (rawTextTags.contains(e.name) && !rcdataTags.contains(e.name))
            e.children.foreach {
              case HText(t) => sb.append(t)
              case c => walk(c)
            }
          else e.children.foreach(walk)
          if (!isRoot) sb.append("</").append(e.name).append('>')
        }
    }
    walk(node)
    sb.toString
  }

  /** First `title` text before `body` (DOMContentUtils.getTitle). */
  def getTitle(root: HNode): String = {
    var res = ""
    var stop = false
    def walk(h: HNode): Unit = h match {
      case e: HElem if !stop =>
        if (e.name == "body") stop = true
        else if (e.name == "title") { res = getText(e); stop = true }
        else e.children.foreach(walk)
      case _ => ()
    }
    walk(root)
    res
  }

  /** Heading texts for one tag in document order (headings plugin —
    * HeadingsParseFilter.getElement walks the DOM collecting each
    * heading's text; the filter keeps the first unless multivalued).
    * Trimmed, whitespace-collapsed via getText, empties dropped. */
  def getHeadings(root: HNode, tag: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    def walk(h: HNode): Unit = h match {
      case e: HElem =>
        if (e.name == tag) {
          val t = getText(e).trim
          if (t.nonEmpty) out += t
        } else e.children.foreach(walk)
      case _ => ()
    }
    walk(root)
    out.result()
  }

  /** Creative-Commons license discovery with the reference's tier order
    * (CCParseFilter.Walker: rdf-in-comment > anchor rel="license" >
    * anchor href under creativecommons.org/licenses). Returns
    * (licenseUrl, location∈{rdf,rel,a}). */
  def getLicense(root: HNode): Option[(String, String)] = {
    val rdfLicRe = java.util.regex.Pattern.compile(
      "<cc:license\\s+rdf:resource=\"([^\"]+)\"|" +
        "xmlns:cc=[^>]*>.*?rdf:resource=\"(http[^\"]*licenses[^\"]*)\"",
      java.util.regex.Pattern.DOTALL)
    var rdf: Option[String] = None
    var rel: Option[String] = None
    var anchor: Option[String] = None
    def walk(h: HNode): Unit = h match {
      case HComment(t) if rdf.isEmpty && t.contains("rdf:RDF") =>
        val m = rdfLicRe.matcher(t)
        if (m.find())
          rdf = Option(m.group(1)).orElse(Option(m.group(2)))
      case e: HElem =>
        if (e.name == "a" || e.name == "link") {
          val href = e.attr("href")
          if (rel.isEmpty &&
              e.attr("rel").exists(_.equalsIgnoreCase("license")))
            rel = href
          if (anchor.isEmpty &&
              href.exists(_.contains("creativecommons.org/licenses/")))
            anchor = href
        }
        e.children.foreach(walk)
      case _ => ()
    }
    walk(root)
    rdf.map((_, "rdf")).orElse(rel.map((_, "rel")))
      .orElse(anchor.map((_, "a")))
  }

  /** Meta-tag harvest (parse-html HTMLMetaProcessor.getMetaTags:55-170):
    * `<meta name=… content=…>` into general tags, `<meta http-equiv=…
    * content=…>` into http-equiv tags — names lowercased, document
    * order kept, metas under `<body>` ignored. Robots directives
    * (`none|noindex|nofollow|noarchive`) set the boolean gates the
    * indexing eligibility tree reads. */
  final case class MetaTags(
      general: Seq[(String, String)],
      httpEquiv: Seq[(String, String)],
      noIndex: Boolean,
      noFollow: Boolean,
      noCache: Boolean)

  def getMetaTags(root: HNode): MetaTags = {
    val gen = Vector.newBuilder[(String, String)]
    val equiv = Vector.newBuilder[(String, String)]
    var noIndex, noFollow, noCache = false
    def walk(h: HNode): Unit = h match {
      case e: HElem if e.name == "body" => () // metas only above body
      case e: HElem =>
        if (e.name == "meta") {
          val content = e.attr("content")
          (e.attr("name"), content) match {
            case (Some(n), Some(c)) =>
              val name = n.toLowerCase
              gen += name -> c
              if (name == "robots") {
                val d = c.toLowerCase
                if (d.contains("none")) { noIndex = true; noFollow = true }
                if (d.contains("noindex")) noIndex = true
                if (d.contains("nofollow")) noFollow = true
                if (d.contains("noarchive")) noCache = true
              }
            case _ => ()
          }
          (e.attr("http-equiv"), content) match {
            case (Some(n), Some(c)) =>
              val name = n.toLowerCase
              equiv += name -> c
              if (name == "pragma" && c.toLowerCase.contains("no-cache"))
                noCache = true
            case _ => ()
          }
        }
        e.children.foreach(walk)
      case _ => ()
    }
    walk(root)
    MetaTags(gen.result(), equiv.result(), noIndex, noFollow, noCache)
  }

  /** `base href` before `body`, if any (DOMContentUtils.getBase). */
  def getBase(root: HNode): Option[String] = {
    var res: Option[String] = None
    var stop = false
    def walk(h: HNode): Unit = h match {
      case e: HElem if !stop =>
        if (e.name == "body") stop = true
        else if (e.name == "base") { res = e.attr("href"); stop = true }
        else e.children.foreach(walk)
      case _ => ()
    }
    walk(root)
    res
  }

  /** RFC 3986-correct resolution incl. the pure-query case of §5.4.1
    * example 7 (URLUtil.resolveURL:55-94: `?y=1` keeps the base's last
    * path segment, which bare java.net resolution drops). */
  def resolveUrl(base: String, target0: String): Option[String] = {
    val target = target0.trim
    try {
      val b = new java.net.URL(base)
      val u =
        if (target.startsWith("?")) {
          val path = b.getPath
          val idx = path.lastIndexOf('/')
          val rightMost = if (idx != -1) path.substring(idx + 1) else ""
          new java.net.URL(b, rightMost + target)
        } else new java.net.URL(b, target)
      // java.net.URL prints empty-authority file URLs as "file:/path";
      // canonicalize to the RFC 8089 "file:///path" form the scheme
      // checks and the normalizer expect
      Some(u.toString.replaceFirst("^file:/(?!/)", "file:///"))
    } catch { case _: Exception => None }
  }

  /** Which elements yield links, from which attribute, and whether they
    * carry inner structure (DOMContentUtils.setConf:79-111). */
  final case class LinkParams(elName: String, attrName: String, childLen: Int)

  private def linkParamsFor(useFormAction: Boolean,
      ignoreTags: Set[String]): Map[String, LinkParams] = {
    val base = Map(
      "a" -> LinkParams("a", "href", 1),
      "area" -> LinkParams("area", "href", 0),
      "frame" -> LinkParams("frame", "src", 0),
      "iframe" -> LinkParams("iframe", "src", 0),
      "script" -> LinkParams("script", "src", 0),
      "link" -> LinkParams("link", "href", 0),
      "img" -> LinkParams("img", "src", 0),
      "source" -> LinkParams("source", "src", 0)) ++
      (if (useFormAction) Map("form" -> LinkParams("form", "action", 1))
       else Map.empty)
    base -- (ignoreTags - (if (useFormAction) "form" else ""))
  }

  private def isWsText(h: HNode): Boolean = h match {
    case HText(t) => t.forall(_.isWhitespace)
    case _ => false
  }

  /** The neko-fixup artifact filter: links with no inner structure
    * (when the element type should have one) or wrapping only a single
    * same-name link plus whitespace (DOMContentUtils
    * .shouldThrowAwayLink:330-379). */
  private def shouldThrowAway(e: HElem, p: LinkParams): Boolean = {
    val ch = e.children
    ch.length match {
      case 0 => p.childLen != 0
      case 1 => ch(0) match {
        case c: HElem => c.name == p.elName
        case _ => false
      }
      case 2 => (ch(0), ch(1)) match {
        case (c0: HElem, c1) if c0.name == p.elName && isWsText(c1) => true
        case (c0, c1: HElem) if c1.name == p.elName && isWsText(c0) => true
        case _ => false
      }
      case 3 => (ch(0), ch(1), ch(2)) match {
        case (c0, c1: HElem, c2) =>
          c1.name == p.elName && isWsText(c0) && isWsText(c2)
        case _ => false
      }
      case _ => false
    }
  }

  /** Empty-text fallback: collect `img alt` strings (and any raw text)
    * beneath the link (DOMContentUtils.getOutlinks:418-449). */
  private def imgAltText(e: HElem): String = {
    val sb = new StringBuilder
    def walk(h: HNode): Unit = h match {
      case el: HElem =>
        if (el.name == "img")
          el.attr("alt").filter(_.trim.nonEmpty).foreach { alt =>
            if (sb.nonEmpty) sb.append(' ')
            sb.append(alt)
          }
        else el.children.foreach(walk)
      case HText(t) if t.nonEmpty =>
        if (sb.nonEmpty) sb.append(' ')
        sb.append(t)
      case _ => ()
    }
    walk(e)
    sb.toString.trim
  }

  /** All outlinks beneath `root` in document order, resolved against
    * `base` (DOMContentUtils.getOutlinks:398-494): rel=nofollow word
    * match skips, method=POST forms skip, empty link text falls back to
    * img alt. No dedup here — that's pipeline policy, not DOM
    * semantics. */
  def getOutlinks(base: String, root: HNode,
      useFormAction: Boolean = true,
      ignoreTags: Set[String] = Set.empty): Seq[Outlink] = {
    val out = ArrayBuffer.empty[Outlink]
    foreachOutlink(base, root, useFormAction, ignoreTags) { o =>
      out += o; true
    }
    out.toSeq
  }

  /** Streaming form of [[getOutlinks]]: `f` returns false to stop the
    * walk — so a caller with an outlink cap (db.max.outlinks.per.page)
    * never pays text-walk + URL-resolution for the links beyond it.
    * Link-farm pages are exactly where that matters. */
  def foreachOutlink(base: String, root: HNode,
      useFormAction: Boolean = true,
      ignoreTags: Set[String] = Set.empty)(f: Outlink => Boolean): Unit = {
    val params = linkParamsFor(useFormAction, ignoreTags)
    var stop = false
    def walk(h: HNode): Unit = if (!stop) h match {
      case e: HElem =>
        params.get(e.name) match {
          case Some(p) =>
            if (!shouldThrowAway(e, p)) {
              val target = e.attr(p.attrName)
              val noFollow =
                e.attr("rel").exists(r => nofollowRe.matcher(r).find())
              // method is only meaningful on form (DOMContentUtils
              // checks it inside the linkParams element's attrs; only
              // form carries a method in practice — an <a method=post>
              // must still link)
              val post = e.name == "form" &&
                e.attr("method").exists(_.equalsIgnoreCase("post"))
              if (target.isDefined && !noFollow && !post) {
                var linkText = getText(e, abortOnNestedAnchors = true).trim
                if (linkText.isEmpty) linkText = imgAltText(e)
                resolveUrl(base, target.get).foreach { u =>
                  if (!f(Outlink(u, linkText))) stop = true
                }
              }
            }
            if (!stop && p.childLen != 0) e.children.foreach(walk)
          case None => e.children.foreach(walk)
        }
      case _ => ()
    }
    walk(root)
  }
}
