package graft.net

import java.util.regex.Pattern

import scala.collection.mutable

/** URL filter extension point (reference: net/URLFilter.java — one of the
  * 12 plugin extension points, nutch-extensionpoints/plugin.xml).
  *
  * Engines are immutable, Serializable rule sets parsed once on the
  * driver and broadcast into executor-side closures — the Spark twin of
  * the reference's per-JVM plugin instances. `filter` returns None to
  * reject (the reference returns null).
  */
trait UrlFilter extends Serializable {
  def filter(url: String): Option[String]
  final def accepts(url: String): Boolean = filter(url).isDefined
}

/** The chain: every active filter must accept, first reject wins
  * (URLFilters.java:57-66). */
final class UrlFilterChain(filters: Seq[UrlFilter]) extends UrlFilter {
  def filter(url: String): Option[String] = {
    var u = url
    val it = filters.iterator
    while (it.hasNext) {
      it.next().filter(u) match {
        case Some(v) => u = v
        case None => return None
      }
    }
    Some(u)
  }
}

/** One `+`/`-` regex rule, optionally scoped to a host or domain
  * (lib-regex-filter RegexRule.java; scoping from
  * RegexURLFilterBase.java:262-271). `fullMatch` switches from the
  * regex plugin's substring search to the automaton plugin's
  * whole-string acceptance (AutomatonURLFilter.Rule.match:115-117 —
  * `RunAutomaton.run` accepts the entire input or nothing). */
final case class RegexRule(sign: Boolean, regex: String,
    hostOrDomain: Option[String], fullMatch: Boolean = false) {
  @transient private lazy val pattern = Pattern.compile(regex)
  def matches(url: String): Boolean =
    if (fullMatch) pattern.matcher(url).matches()
    else pattern.matcher(url).find()
}

/** urlfilter-regex: ordered `+accept` / `-reject` regex rules, first
  * match wins, no match rejects (RegexURLFilterBase.java:170-206,
  * readRules at 238-283 incl. the `> host … <` scoping of NUTCH-1838).
  */
final class RegexUrlFilter(val rules: Seq[RegexRule]) extends UrlFilter {
  private val hasScoped = rules.exists(_.hostOrDomain.isDefined)

  /** Compile an unscoped rule set into a single codegen'd Column — the
    * 100 TB path: first-match-wins becomes a CASE/rlike cascade inside
    * whole-stage codegen, no UDF ser/de. Scoped (`> host`) rule sets
    * need per-URL host extraction and stay on the scalar engine. */
  def toColumn(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    require(!hasScoped, "scoped rule sets are not column-compilable")
    import org.apache.spark.sql.functions.{lit, when}
    rules.reverse.foldLeft(lit(false)) { (acc, r) =>
      // full-match rules anchor explicitly: rlike is substring search.
      // \z, not $ — $ matches before a trailing newline, matches() not
      val re = if (r.fullMatch) s"^(?:${r.regex})\\z" else r.regex
      when(url.rlike(re), lit(r.sign)).otherwise(acc)
    }
  }

  def filter(url: String): Option[String] = {
    val host = if (hasScoped) UrlParts.host(url) else None
    val domain = if (hasScoped) UrlParts.domain(url) else None
    rules.foreach { r =>
      val inScope = r.hostOrDomain.forall(hd =>
        host.contains(hd) || domain.contains(hd))
      if (inScope && r.matches(url))
        return if (r.sign) Some(url) else None
    }
    None
  }
}

object RegexUrlFilter {
  /** Parse the rules grammar: `+re`, `-re`, `> host`, `<`, `#` comments
    * (RegexURLFilterBase.java:238-283). */
  def parse(lines: Iterator[String],
      fullMatch: Boolean = false): RegexUrlFilter = {
    val rules = mutable.ArrayBuffer.empty[RegexRule]
    var scope: Option[String] = None
    lines.foreach { line =>
      if (line.nonEmpty) line.charAt(0) match {
        case '+' => rules += RegexRule(sign = true, line.substring(1), scope,
          fullMatch)
        case '-' => rules += RegexRule(sign = false, line.substring(1), scope,
          fullMatch)
        case '>' => scope = Some(line.substring(1).trim)
        case '<' => scope = None
        case ' ' | '#' => ()
        case _ => throw new IllegalArgumentException(
          s"Invalid first character: $line")
      }
    }
    new RegexUrlFilter(rules.toSeq)
  }
}

/** urlfilter-automaton: the same first-match-wins rule grammar, but each
  * rule accepts the WHOLE url or nothing (AutomatonURLFilter.java:41-118
  * runs a dk.brics DFA over the full input; rule-file grammar shared via
  * RegexURLFilterBase). The automaton library's point is throughput —
  * here the scale path is the same codegen'd column cascade, so the
  * engine reduces to anchored-match rules. */
object AutomatonUrlFilter {
  def parse(lines: Iterator[String]): RegexUrlFilter =
    RegexUrlFilter.parse(lines, fullMatch = true)
}

/** urlfilter-prefix: accept iff the URL starts with any configured prefix
  * (PrefixURLFilter.java:68-73; the reference's TrieStringMatcher is an
  * O(|url|) prefix trie — ours is a sorted-array binary search with the
  * same asymptotics for the rule counts that fit a broadcast). */
final class PrefixUrlFilter(prefixes: Seq[String]) extends UrlFilter {
  private val sorted = prefixes.sorted.toArray
  def filter(url: String): Option[String] = {
    // binary search for the insertion point; the candidate prefix is the
    // greatest entry <= url, and only entries that are prefixes of url
    // can sort in (candidate..url]
    var lo = 0; var hi = sorted.length - 1; var found = false
    while (lo <= hi && !found) {
      val mid = (lo + hi) >>> 1
      if (url.startsWith(sorted(mid))) found = true
      else if (sorted(mid) < url) lo = mid + 1
      else hi = mid - 1
    }
    if (found) Some(url) else None
  }
}

object PrefixUrlFilter {
  def parse(lines: Iterator[String]): PrefixUrlFilter =
    new PrefixUrlFilter(lines.filterNot(l =>
      l.isEmpty || l.startsWith("#")).toSeq)
}

/** urlfilter-suffix (SuffixURLFilter.java:145-254): match the URL (or
  * just its path with `-P`) against a suffix set; `-` header = reject on
  * match (default), `+` = accept only on match; `-I`/`+I` adds
  * case-insensitivity. */
final class SuffixUrlFilter(suffixes: Seq[String], modeAccept: Boolean,
    ignoreCase: Boolean, filterFromPath: Boolean) extends UrlFilter {
  private val set = suffixes.map(s =>
    if (ignoreCase) s.toLowerCase else s).toArray

  def filter(url: String): Option[String] = {
    if (url == null) return None
    var u = if (ignoreCase) url.toLowerCase else url
    if (filterFromPath) {
      try u = new java.net.URL(u).getPath
      catch { case _: java.net.MalformedURLException => () }
    }
    // match in accept-mode rejects (the suffix set is a denylist); match
    // in reject-mode accepts (allowlist) — SuffixURLFilter.java:162-173
    val matched = set.exists(u.endsWith)
    if (matched != modeAccept) Some(url) else None
  }
}

object SuffixUrlFilter {
  def parse(lines: Iterator[String]): SuffixUrlFilter = {
    val suffixes = mutable.ArrayBuffer.empty[String]
    var modeAccept = false
    var ignoreCase = false
    var fromPath = false
    lines.map(_.trim).foreach { line =>
      if (line.nonEmpty) line.charAt(0) match {
        case '#' => ()
        case '-' =>
          modeAccept = false
          if (line.contains("P")) fromPath = true
          if (line.contains("I")) ignoreCase = true
        case '+' =>
          modeAccept = true
          if (line.contains("P")) fromPath = true
          if (line.contains("I")) ignoreCase = true
        case _ => suffixes += (if (ignoreCase) line.toLowerCase else line)
      }
    }
    new SuffixUrlFilter(suffixes.toSeq, modeAccept, ignoreCase, fromPath)
  }
}

/** urlfilter-fast (FastURLFilter.java): host/domain-keyed deny rules so
  * only the handful of rules scoped to a URL's own host/domain suffixes
  * run — O(#host-labels) lookups instead of O(#rules) regex scans. The
  * default is accept; first matching deny rule rejects. */
final class FastUrlFilter(
    hostRules: Map[String, Seq[FastUrlFilter.Rule]],
    domainRules: Map[String, Seq[FastUrlFilter.Rule]],
    maxUrlLength: Int = -1, maxPathLength: Int = -1,
    maxQueryLength: Int = -1) extends UrlFilter {

  def filter(url: String): Option[String] = {
    if (maxUrlLength != -1 && url.length > maxUrlLength) return None
    val u =
      try new java.net.URL(url)
      catch { case _: Exception => return None } // unparseable → reject
    val path = u.getPath
    if (maxPathLength != -1 && path.length > maxPathLength) return None
    val query = u.getQuery
    if (maxQueryLength != -1 && query != null &&
      query.length > maxQueryLength) return None

    val hostname = u.getHost
    hostRules.getOrElse(hostname, Nil).foreach(r =>
      if (r.matches(u)) return None)
    // domain rules: full host, then every dot-suffix, then global "."
    // (FastURLFilter.java:207-233)
    domainRules.getOrElse(hostname, Nil).foreach(r =>
      if (r.matches(u)) return None)
    var start = 0
    var pos = hostname.indexOf('.', start)
    while (pos != -1) {
      start = pos + 1
      val domain = hostname.substring(start)
      domainRules.getOrElse(domain, Nil).foreach(r =>
        if (r.matches(u)) return None)
      pos = hostname.indexOf('.', start)
    }
    domainRules.getOrElse(".", Nil).foreach(r =>
      if (r.matches(u)) return None)
    Some(url)
  }
}

object FastUrlFilter {
  /** DenyPath matches the path; DenyPathQuery matches path?query
    * (FastURLFilter.java:363-412), both via find(). */
  final case class Rule(regex: String, withQuery: Boolean) {
    @transient private lazy val pattern = Pattern.compile(regex)
    def matches(u: java.net.URL): Boolean = {
      val hay =
        if (withQuery)
          u.getPath + (if (u.getQuery != null) "?" + u.getQuery else "")
        else u.getPath
      pattern.matcher(hay).find()
    }
  }

  def parse(lines: Iterator[String]): FastUrlFilter = {
    val hostRules = mutable.LinkedHashMap
      .empty[String, mutable.ArrayBuffer[Rule]]
    val domainRules = mutable.LinkedHashMap
      .empty[String, mutable.ArrayBuffer[Rule]]
    var current: Option[(Boolean, String)] = None // (isHost, name)
    lines.foreach { raw =>
      val line = (raw.indexOf('#') match {
        case -1 => raw
        case i => raw.substring(0, i)
      }).trim
      if (line.nonEmpty) {
        val parts = line.split("\\s+")
        parts(0) match {
          case "Host" => current = Some((true, parts(1)))
          case "Domain" => current = Some((false, parts(1)))
          case "DenyPath" | "DenyPathQuery" =>
            val rule = Rule(parts(1), parts(0) == "DenyPathQuery")
            current match {
              case Some((true, h)) =>
                hostRules.getOrElseUpdate(h, mutable.ArrayBuffer.empty) += rule
              case Some((false, d)) =>
                domainRules.getOrElseUpdate(d, mutable.ArrayBuffer.empty) += rule
              case None => throw new IllegalArgumentException(
                s"rule before Host/Domain: $line")
            }
          case _ => throw new IllegalArgumentException(s"bad rule: $line")
        }
      }
    }
    new FastUrlFilter(
      hostRules.map { case (k, v) => k -> v.toSeq }.toMap,
      domainRules.map { case (k, v) => k -> v.toSeq }.toMap)
  }
}

/** urlfilter-domain / urlfilter-domaindenylist: membership of the URL's
  * host, PSL-registrable domain, or public suffix in a rule set — the
  * most commonly configured filter pair in real crawls
  * (DomainURLFilter.java:78-184, DomainDenylistURLFilter.java:78-182).
  *
  * `deny = false` (urlfilter-domain): allow only matching URLs; an
  * EMPTY rule set allows everything (NUTCH-2189). `deny = true`
  * (urlfilter-domaindenylist): reject matching URLs. Unparseable URLs
  * are rejected by both engines (both reference filters return null
  * from their catch block). Rule entries are lowercase hostnames,
  * registrable domains, or bare suffixes, one per line, `#` comments. */
final class DomainUrlFilter(val rules: Set[String], val deny: Boolean)
    extends UrlFilter {

  def filter(url: String): Option[String] = {
    if (!deny && rules.isEmpty) return Some(url) // NUTCH-2189
    UrlParts.host(url) match {
      case None => None
      case Some(h) =>
        val matched = rules.contains(graft.functions.Psl.domainSuffix(h)) ||
          rules.contains(graft.functions.Psl.assignedDomain(h)) ||
          rules.contains(h)
        if (matched != deny) Some(url) else None
    }
  }

  /** The scale path: membership as a codegen'd Column predicate. The
    * three lookups compile to InSet (O(1) hash per row) over the
    * PSL-backed host/domain/suffix expressions — no UDF, no shuffle;
    * rule sets ride the plan as literals (broadcast-sized by nature:
    * a domain list is KBs even at millions of crawled hosts). */
  def toColumn(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{coalesce, lit, lower, regexp_extract}
    import graft.functions.Urls
    if (!deny && rules.isEmpty) lit(true)
    else {
      // canonicalize like the scalar path: case-tolerant scheme,
      // userinfo/port stripped, lowercased — otherwise the row engine
      // and the column engine disagree on e.g. WWW.Exact.Com:8080
      val host = lower(regexp_extract(url,
        "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)", 1))
      val rs = rules.toSeq
      val matched = coalesce(
        Urls.domainSuffixOfHost(host).isin(rs: _*) ||
          Urls.registeredDomainOfHost(host).isin(rs: _*) ||
          host.isin(rs: _*),
        lit(false))
      // unparseable URLs (no host) reject in both engines; the
      // regexp_extract host is '' when nothing matches, never null
      if (deny) host =!= lit("") && !matched else matched
    }
  }
}

object DomainUrlFilter {
  /** Rule-file parser (readConfiguration in both reference filters):
    * trim, drop blanks and `#` comments, lowercase. */
  def parse(lines: Iterator[String], deny: Boolean = false): DomainUrlFilter =
    new DomainUrlFilter(
      lines.map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("#"))
        .map(_.toLowerCase)
        .toSet,
      deny)
}

/** urlfilter-validator: RFC 2396-shaped syntactic URL validation
  * (UrlValidator.java:57-388, derived from Apache commons-validator).
  * Accepts only printable-ASCII URLs whose scheme is alphabetic, whose
  * authority is an IPv4 address (octets ≤ 255) or a dotted hostname
  * (≥ 2 segments, TLD ≥ 2 chars starting alphabetic, optional 1-5
  * digit port), whose path stays in the allowed charset without
  * climbing above root via `..`, any query. Conformance-tested against
  * TestUrlValidator.java:41-76. */
object ValidatorUrlFilter extends UrlFilter {
  private val atom = "[^\\s;/@&=,.?:+$]+"
  private val urlRe = Pattern.compile(
    "(([^:/?#]+):)?(//([^/?#]*))?([^?#]*)(\\?([^#]*))?(#(.*))?")
  private val legalAscii = Pattern.compile("[\\x21-\\x7E]+")
  private val schemeRe = Pattern.compile("[a-zA-Z]+")
  private val authorityRe = Pattern.compile("([a-zA-Z\\d\\-\\.]*)(:\\d*)?(.*)?")
  private val ipv4Re = Pattern.compile(
    "(\\d{1,3})[.](\\d{1,3})[.](\\d{1,3})[.](\\d{1,3})")
  private val domainRe = Pattern.compile(s"$atom(\\.$atom)*")
  private val portRe = Pattern.compile(":(\\d{1,5})")
  private val pathRe = Pattern.compile("(/[-\\w:@&?=+,.!/~*'%$_;\\(\\)]*)?")

  private def countOf(token: String, s: String): Int = {
    var i = 0; var n = 0
    while ({ i = s.indexOf(token, i); i >= 0 }) { i += 1; n += 1 }
    n
  }

  private def validAuthority(auth: String): Boolean = {
    val m = authorityRe.matcher(auth)
    if (!m.matches()) return false
    val host = m.group(1)
    val ip = ipv4Re.matcher(host)
    val isIp = ip.matches() &&
      (1 to 4).forall(i => ip.group(i).toInt <= 255)
    val isHostname = !isIp && domainRe.matcher(host).matches() && {
      val segs = host.split("\\.")
      val top = segs.last
      segs.length >= 2 && top.length >= 2 && top.head.isLetter
    }
    if (!isIp && !isHostname) return false
    val port = m.group(2)
    if (port != null && !portRe.matcher(port).matches()) return false
    val extra = m.group(3)
    extra == null || extra.trim.isEmpty
  }

  private def validPath(path: String): Boolean =
    path != null && pathRe.matcher(path).matches() && {
      val dots = countOf("..", path)
      dots <= 0 ||
        (countOf("/", path) - countOf("//", path) - 1) > dots
    }

  def filter(url: String): Option[String] = {
    if (url == null || !legalAscii.matcher(url).matches()) return None
    val m = urlRe.matcher(url)
    val ok = m.matches() &&
      m.group(2) != null && schemeRe.matcher(m.group(2)).matches() &&
      m.group(4) != null && validAuthority(m.group(4)) &&
      validPath(m.group(5))
    if (ok) Some(url) else None
  }
}

/** Scalar host/domain helpers shared by the scoped filters
  * (URLUtil.getHost / getDomainName). */
object UrlParts {
  private val hostRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)".r

  def host(url: String): Option[String] =
    hostRe.findFirstMatchIn(url).map(_.group(1).toLowerCase)

  /** Registrable domain via the full PSL engine — same code path as
    * functions.Urls.registeredDomain. */
  def domain(url: String): Option[String] =
    host(url).map(graft.functions.Psl.assignedDomain)
}
