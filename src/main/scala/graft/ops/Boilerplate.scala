package graft.ops

/** First-party main-content (boilerplate-removal) extraction — the
  * reference's `tika.extractor=boilerpipe` integration
  * (TestBoilerpipeExtraction.java; BoilerplateSpec passes its
  * assertions on the reference's own HTML fixture), re-implemented
  * from the published algorithm rather than the library: shallow-text
  * densitometric classification per Kohlschütter, Fankhauser &
  * Nejdl, "Boilerplate Detection using Shallow Text Features"
  * (WSDM 2010).
  *
  * Pipeline:
  *   1. block segmentation: the DOM flushes a text block at every
  *     block-level element boundary; per block, word count (tokens
  *     containing a letter/digit) and anchor-word count (words under
  *     an `<a>`) → link density
  *   2. the paper's NumWordsRules classifier: a block is content when
  *     its link density ≤ 1/3 and — depending on the previous block's
  *     link density — the current/next/previous word counts clear the
  *     published thresholds (16/15/4, or 40/17 after a link-dense
  *     block)
  *   3. terminating-blocks pass (the ArticleExtractor refinement that
  *     matters for crawled pages): short blocks that read as footer
  *     furniture ("copyright …", "all rights reserved", "© …",
  *     "comments", "terms of …", "privacy policy") end the article
  *     once any content has been seen
  *
  * This is the LLM-corpus quality lever: nav/footer furniture is the
  * single biggest source of cross-document duplicated lines, so
  * main-content extraction upstream shrinks what line/span dedup must
  * remove downstream. */
object Boilerplate {

  final case class Block(text: String, words: Int, anchorWords: Int,
      heading: Boolean) {
    def linkDensity: Double =
      if (words == 0) 0.0 else anchorWords.toDouble / words
  }

  private val BlockTags = Set("address", "article", "aside", "blockquote",
    "body", "caption", "dd", "div", "dl", "dt", "fieldset", "figcaption",
    "figure", "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6",
    "header", "hr", "li", "main", "nav", "ol", "p", "pre", "section",
    "table", "td", "th", "tr", "ul", "br")

  private def isWord(t: String): Boolean = t.exists(_.isLetterOrDigit)

  /** Segment a parsed DOM into text blocks. */
  def blocks(root: Html.HNode): Seq[Block] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Block]
    val cur = new StringBuilder
    var curWords = 0
    var curAnchor = 0
    var anchorDepth = 0
    var headingDepth = 0
    var curHeading = false
    def flush(): Unit = {
      val text = cur.toString.trim
      if (text.nonEmpty)
        out += Block(text, curWords, curAnchor, curHeading)
      cur.clear(); curWords = 0; curAnchor = 0; curHeading = false
    }
    def walk(n: Html.HNode): Unit = n match {
      case Html.HText(t) =>
        val clean = t.replaceAll("\\s+", " ")
        if (clean.trim.nonEmpty) {
          if (cur.nonEmpty && cur.last != ' ') cur.append(' ')
          cur.append(clean.trim)
          val ws = clean.trim.split(' ').count(isWord)
          curWords += ws
          if (anchorDepth > 0) curAnchor += ws
          if (headingDepth > 0) curHeading = true
        }
      case _: Html.HComment => ()
      case e: Html.HElem =>
        if (e.name == "script" || e.name == "style") ()
        else {
          val block = BlockTags.contains(e.name)
          val heading = e.name.length == 2 && e.name(0) == 'h' &&
            e.name(1).isDigit
          if (block) flush()
          if (e.name == "a") anchorDepth += 1
          if (heading) headingDepth += 1
          e.children.foreach(walk)
          if (heading) headingDepth -= 1
          if (e.name == "a") anchorDepth -= 1
          if (block) flush()
        }
    }
    walk(root)
    flush()
    out.toSeq
  }

  /** The WSDM'10 NumWordsRules decision function. */
  private[ops] def isContent(prev: Block, curr: Block,
      next: Block): Boolean =
    if (curr.linkDensity > 0.333333) false
    else if (prev.linkDensity <= 0.555556)
      curr.words > 16 || next.words > 15 || prev.words > 4
    else
      curr.words > 40 || next.words > 17

  private val TermStarts = Seq("comments", "copyright", "©",
    "all rights reserved", "terms of", "privacy policy",
    "please enable javascript")

  private[ops] def isTerminating(b: Block): Boolean = {
    val t = b.text.toLowerCase
    b.words < 12 && TermStarts.exists(t.startsWith)
  }

  private val Empty = Block("", 0, 0, heading = false)

  /** Main-content text of an HTML page, newline-joined per block. */
  def mainContent(html: String): String = {
    val bs = blocks(Html.parse(html))
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var seenContent = false
    var terminated = false
    var i = 0
    while (i < bs.length && !terminated) {
      val prev = if (i > 0) bs(i - 1) else Empty
      val next = if (i + 1 < bs.length) bs(i + 1) else Empty
      val b = bs(i)
      if (seenContent && isTerminating(b)) terminated = true
      else if (isContent(prev, b, next) && !isTerminating(b)) {
        out += b.text
        seenContent = true
      }
      i += 1
    }
    out.mkString("\n")
  }
}
