package graft.net

/** F6/X13 — JEXL predicate translation (CrawlDatum.java:573-625 evaluates
  * JEXL expressions against datum fields; JexlUtil.java builds the
  * engine; used by Generator -expr, CrawlDbReader -expr, dump filters).
  *
  * The supported JEXL dialect is expression-only (no loops/assignment):
  * comparisons (== != < <= > >=), logical && || !, arithmetic, grouping,
  * string/number literals, identifiers. It maps token-for-token onto
  * Spark SQL `expr()`: `==`→`=`, `&&`→`AND`, `||`→`OR`, `!`→`NOT`,
  * `=~`/`!~` (list membership)→`IN`/`NOT IN`. String literals pass
  * through untouched (both dialects quote with '). The result stays a
  * Catalyst expression — fully codegen, pushdown-eligible. */
object Jexl {

  def toSqlExpr(jexl: String): String = {
    val sb = new StringBuilder
    var i = 0
    val n = jexl.length
    // keyword emission with exactly one space on each side
    def emit(word: String, consumed: Int): Unit = {
      i += consumed
      if (sb.nonEmpty && sb.charAt(sb.length - 1) != ' ') sb.append(' ')
      sb.append(word).append(' ')
      while (i < n && jexl.charAt(i) == ' ') i += 1
    }
    while (i < n) {
      val c = jexl.charAt(i)
      c match {
        case '\'' | '"' => // string literal: copy verbatim, normalize to '
          val quote = c
          val start = i
          i += 1
          while (i < n && jexl.charAt(i) != quote) {
            i += 1
          }
          i = math.min(i + 1, n)
          val body = jexl.substring(start + 1, math.max(start + 1, i - 1))
          sb.append('\'').append(body.replace("'", "''")).append('\'')
        case '=' if i + 1 < n && jexl.charAt(i + 1) == '=' =>
          sb.append("="); i += 2
        case '=' if i + 1 < n && jexl.charAt(i + 1) == '~' =>
          emit("IN", 2)
        case '!' if i + 1 < n && jexl.charAt(i + 1) == '~' =>
          emit("NOT IN", 2)
        case '!' if i + 1 < n && jexl.charAt(i + 1) == '=' =>
          sb.append("!="); i += 2
        case '!' =>
          emit("NOT", 1)
        case '&' if i + 1 < n && jexl.charAt(i + 1) == '&' =>
          emit("AND", 2)
        case '|' if i + 1 < n && jexl.charAt(i + 1) == '|' =>
          emit("OR", 2)
        case _ =>
          sb.append(c); i += 1
      }
    }
    sb.toString
  }
}
