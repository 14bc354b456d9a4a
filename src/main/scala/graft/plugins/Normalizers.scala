package graft.plugins

import java.net.URLDecoder
import java.nio.charset.StandardCharsets.UTF_8
import java.util.regex.Pattern

import graft.plugins.Extensions.UrlNormalizer

/** F1 — the URL-normalizer engine family beyond the Basic normalizer.
  *
  * Reference engines (each a plugin in the reference's
  * `src/plugin/urlnormalizer-*`):
  *   - regex       RegexURLNormalizer.java:332  (rule-file driven)
  *   - querystring QuerystringURLNormalizer.java:85 (sort query params)
  *   - slash       SlashURLNormalizer.java:211  (per-host trailing slash)
  *   - ajax        AjaxURLNormalizer.java:239   (#! ↔ _escaped_fragment_)
  *   - host        HostURLNormalizer.java:140   (host remap, wildcards)
  *   - protocol    ProtocolURLNormalizer.java:204 (scheme per host/domain)
  *   - pass        urlnormalizer-pass           (identity)
  *
  * Unlike the reference's Hadoop-Configuration + classloader plumbing,
  * each engine here is a pure value: rules are parsed once on the driver
  * and the engine closure is broadcast with the task — the natural Spark
  * shape for a per-row string transform (no per-executor file reads).
  * All engines are wired through `Extensions.Registry.scopedNormalizers`
  * which already implements the nine-scope fallback chain.
  */
object Normalizers {

  /** Minimal URL split mirroring the java.net.URL accessors the
    * reference engines rely on: getProtocol/getHost/getPort/getPath/
    * getQuery/getRef. Returns None where `new URL(...)` would throw. */
  final case class UrlParts(scheme: String, host: String, port: Int,
      path: String, query: Option[String], ref: Option[String]) {
    def hostPort: String = if (port >= 0) s"$host:$port" else host
  }

  private val urlRe =
    "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#:]*)(?::(\\d+))?([^?#]*)(?:\\?([^#]*))?(?:#(.*))?$".r

  def split(url: String): Option[UrlParts] = url match {
    case urlRe(scheme, host, port, path, query, ref) =>
      Some(UrlParts(scheme, host,
        if (port == null) -1 else port.toInt,
        if (path == null) "" else path,
        Option(query), Option(ref)))
    case _ => None
  }

  // -------------------------------------------------------------------------
  // regex engine (RegexURLNormalizer.java)
  // -------------------------------------------------------------------------

  /** One compiled pattern→substitution rule (Rule class,
    * RegexURLNormalizer.java:74-78). */
  final case class RegexRule(pattern: Pattern, substitution: String)
      extends Serializable

  /** Rule-file-driven regex substitution engine. Per-scope rule sets with
    * default fallback (regexNormalize, RegexURLNormalizer.java:167-205):
    * a scope with no configured rules uses the default rules; every rule
    * in the active set is applied in file order via replaceAll. */
  final class RegexUrlNormalizer(
      defaultRules: Seq[RegexRule],
      scopedRules: Map[String, Seq[RegexRule]] = Map.empty)
      extends UrlNormalizer {
    def normalize(url: String, scope: String): Option[String] = {
      val rules = scopedRules.getOrElse(scope, defaultRules)
      Some(rules.foldLeft(url)((u, r) =>
        r.pattern.matcher(u).replaceAll(r.substitution)))
    }
  }

  object RegexUrlNormalizer {
    /** Parse the reference's rule-file format: `<regex-normalize>` root,
      * `<regex><pattern>..</pattern><substitution>..</substitution></regex>`
      * children; a missing/empty substitution element means "" and rules
      * with invalid patterns are skipped
      * (readConfiguration, RegexURLNormalizer.java:224-284). */
    def parseRules(xml: String): Seq[RegexRule] = {
      val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
        .newDocumentBuilder()
        .parse(new org.xml.sax.InputSource(new java.io.StringReader(xml)))
      val regexes = doc.getDocumentElement.getChildNodes
      (0 until regexes.getLength).flatMap { i =>
        regexes.item(i) match {
          case e: org.w3c.dom.Element if e.getTagName == "regex" =>
            val kids = e.getChildNodes
            var pat: Option[String] = None
            var sub = ""
            (0 until kids.getLength).foreach { j =>
              kids.item(j) match {
                case f: org.w3c.dom.Element =>
                  val text = Option(f.getFirstChild).map(_.getNodeValue)
                  f.getTagName match {
                    case "pattern"      => pat = text
                    case "substitution" => sub = text.getOrElse("")
                    case _              =>
                  }
                case _ =>
              }
            }
            pat.flatMap { p =>
              try Some(RegexRule(Pattern.compile(p), sub))
              catch { case _: java.util.regex.PatternSyntaxException => None }
            }
          case _ => None
        }
      }
    }
  }

  // -------------------------------------------------------------------------
  // querystring engine (QuerystringURLNormalizer.java:53-85)
  // -------------------------------------------------------------------------

  /** Sorts query-string parameters lexicographically so permutations of
    * the same parameters collapse to one URL. URLs without a query pass
    * through verbatim; port and fragment are preserved. */
  final class QuerystringUrlNormalizer extends UrlNormalizer {
    def normalize(url: String, scope: String): Option[String] =
      split(url).map { u =>
        u.query match {
          case None => url
          case Some(q) =>
            val sorted = q.split("&", -1).sorted.mkString("&")
            val ref = u.ref.map("#" + _).getOrElse("")
            s"${u.scheme}://${u.hostPort}${u.path}?$sorted$ref"
        }
      }
  }

  // -------------------------------------------------------------------------
  // slash engine (SlashURLNormalizer.java:149-211)
  // -------------------------------------------------------------------------

  /** Per-host trailing-slash policy: `host -> true` appends a slash to
    * slash-less paths (unless the last segment looks like `name.ext` —
    * a dot within the final 5 chars), `host -> false` strips a trailing
    * slash. Root paths ("/" or "") are never touched. */
  final class SlashUrlNormalizer(rules: Map[String, Boolean])
      extends UrlNormalizer {
    def normalize(url: String, scope: String): Option[String] =
      split(url).map { u =>
        rules.get(u.host) match {
          case Some(rule) if u.path.length > 1 =>
            val qs = u.query.map("?" + _).getOrElse("")
            val trailing = u.path.endsWith("/")
            if (!trailing && rule) {
              // extension heuristic (SlashURLNormalizer.java:176-180)
              val dot = u.path.lastIndexOf('.')
              if (u.path.length < 6 || dot == -1 || dot < u.path.length - 6)
                s"${u.scheme}://${u.hostPort}${u.path}/$qs"
              else url
            } else if (trailing && !rule) {
              val cut = u.path.substring(0, u.path.length - 1)
              s"${u.scheme}://${u.hostPort}$cut$qs"
            } else url
          case _ => url
        }
      }
  }

  object SlashUrlNormalizer {
    /** `host<ws>+|-` per line; '#' comments and blanks skipped
      * (readConfiguration, SlashURLNormalizer.java:64-88). */
    def parseRules(text: String): Map[String, Boolean] =
      text.linesIterator
        .map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("#"))
        .flatMap { l =>
          val i = l.indexWhere(c => c == ' ' || c == '\t')
          if (i < 0) None
          else Some(l.take(i) -> (l.drop(i + 1).trim == "+"))
        }
        .toMap
  }

  // -------------------------------------------------------------------------
  // ajax engine (AjaxURLNormalizer.java:62-239)
  // -------------------------------------------------------------------------

  /** `#!` AJAX fragment ↔ `_escaped_fragment_=` query rewriting: crawl
    * scopes rewrite `#!frag` to a fetchable `?_escaped_fragment_=frag`;
    * the indexer scope reverses the mapping so indexed URLs show the
    * user-facing `#!` form. */
  final class AjaxUrlNormalizer extends UrlNormalizer {
    import AjaxUrlNormalizer._

    def normalize(url: String, scope: String): Option[String] = {
      if (scope == Extensions.Scope.Indexer && url.contains(EscapedPart))
        unescapeForm(url)
      else if (url.contains(AjaxPart)) escapedForm(url)
      else Some(url)
    }

    /** `#!frag` → `?_escaped_fragment_=<escaped frag>`
      * (normalizeHashedFragment, AjaxURLNormalizer.java:90-110). */
    private def escapedForm(url: String): Option[String] =
      split(url).map { u =>
        val pos = url.indexOf(AjaxPart)
        val sep = if (u.query.isEmpty) "?" else "&"
        url.substring(0, pos) + sep + EscapedPart +
          escape(url.substring(pos + AjaxPart.length))
      }

    /** `?_escaped_fragment_=frag` → `#!<unescaped frag>`
      * (normalizeEscapedFragment, AjaxURLNormalizer.java:119-165: the
      * escaped pair is everything after the first '&', or the whole
      * query when it is the only pair). */
    private def unescapeForm(url: String): Option[String] =
      split(url).flatMap { u =>
        u.query.map { q =>
          val amp = q.indexOf('&')
          val (rest, pair) =
            if (amp == -1) ("", q) else (q.substring(0, amp), q.substring(amp + 1))
          val frag = unescape(pair.replaceFirst(Pattern.quote(EscapedPart), ""))
          val qs = if (rest.nonEmpty) "?" + rest else ""
          s"${u.scheme}://${u.hostPort}${u.path}$qs#!$frag"
        }
      }
  }

  object AjaxUrlNormalizer {
    val AjaxPart = "#!"
    val EscapedPart = "_escaped_fragment_="

    /** Escape control bytes + `# % & +` in the fragment
      * (escape, AjaxURLNormalizer.java:190-220). */
    def escape(fragment: String): String = {
      val sb = new StringBuilder(fragment.length)
      fragment.getBytes(UTF_8).foreach { b =>
        if (b < 33) sb.append(f"%%${b & 0xff}%02X")
        else if (b == '#') sb.append("%23")
        else if (b == '%') sb.append("%25")
        else if (b == '&') sb.append("%26")
        else if (b == '+') sb.append("%2B")
        else sb.append(b.toChar)
      }
      sb.toString
    }

    def unescape(fragment: String): String =
      try URLDecoder.decode(fragment, UTF_8)
      catch { case _: IllegalArgumentException => fragment }
  }

  // -------------------------------------------------------------------------
  // host engine (HostURLNormalizer.java:96-162)
  // -------------------------------------------------------------------------

  /** Maps hosts to a canonical form (`example.org -> www.example.org`).
    * `*.domain` wildcard rules match any proper subdomain, checked from
    * the most-specific suffix outward. */
  final class HostUrlNormalizer(hosts: Map[String, String])
      extends UrlNormalizer {
    def normalize(url: String, scope: String): Option[String] =
      split(url).map { u =>
        hosts.get(u.host) match {
          case Some(target) => replaceHost(url, u.host, target)
          case None =>
            // wildcard walk: tld, then grow the suffix leftward
            // (HostURLNormalizer.java:139-160)
            val parts = u.host.split("\\.")
            var suffix = parts.last
            var found: Option[String] = None
            var i = parts.length - 2
            while (i > 0 && found.isEmpty) {
              suffix = parts(i) + "." + suffix
              found = hosts.get("*." + suffix)
              i -= 1
            }
            found.map(replaceHost(url, u.host, _)).getOrElse(url)
        }
      }

    private def replaceHost(url: String, host: String, target: String): String = {
      val i = url.indexOf(host)
      url.substring(0, i) + target + url.substring(i + host.length)
    }
  }

  object HostUrlNormalizer {
    /** `host<space>target` per line; '#' comments and blanks skipped. */
    def parseRules(text: String): Map[String, String] =
      text.linesIterator
        .map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("#"))
        .flatMap { l =>
          val i = l.indexOf(' ')
          if (i < 0) None else Some(l.take(i) -> l.drop(i + 1))
        }
        .toMap
  }

  // -------------------------------------------------------------------------
  // protocol engine (ProtocolURLNormalizer.java:83-230)
  // -------------------------------------------------------------------------

  /** Forces a scheme per host or per `*.domain` suffix (e.g. rewrite all
    * `http://host/...` to https where the host is https-only). URLs with
    * an explicit port keep their scheme untouched. */
  final class ProtocolUrlNormalizer(
      hostProtocols: Map[String, String],
      domainProtocols: Map[String, String])
      extends UrlNormalizer {
    def normalize(url: String, scope: String): Option[String] =
      split(url).map { u =>
        if (u.port != -1) url // explicit port: leave alone
        else {
          val required = hostProtocols.get(u.host).orElse {
            // longest-suffix domain match (SuffixStringMatcher analog;
            // keys carry the leading dot so www.myexample.com cannot
            // match *.example.com)
            domainProtocols.keys.filter(u.host.endsWith)
              .toSeq.sortBy(-_.length).headOption.map(domainProtocols)
          }
          required match {
            case Some(p) if p != u.scheme =>
              p + url.substring(u.scheme.length)
            case _ => url
          }
        }
      }
  }

  object ProtocolUrlNormalizer {
    /** RFC 1630 scheme validator (ProtocolURLNormalizer.java:77-79). */
    private val protocolRe = Pattern.compile(
      "^[a-z](?:[a-z0-9$\\-_@.&!*\"'(),]|%[0-9a-f]{2})*$",
      Pattern.CASE_INSENSITIVE)

    /** `host-or-*.domain<ws>protocol` per line; invalid protocols and
      * malformed lines are skipped (readConfiguration,
      * ProtocolURLNormalizer.java:83-140). Returns (hosts, domains). */
    def parseRules(text: String): (Map[String, String], Map[String, String]) = {
      val hosts = Map.newBuilder[String, String]
      val domains = Map.newBuilder[String, String]
      text.linesIterator.map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("#"))
        .foreach { l =>
          val i = l.indexWhere(c => c == ' ' || c == '\t')
          if (i >= 0) {
            val host = l.take(i)
            val protocol = l.drop(i + 1).trim
            if (host.nonEmpty && protocolRe.matcher(protocol).matches()) {
              if (host.startsWith("*.")) {
                domains += host.substring(1) -> protocol // ".example.com"
                hosts += host.substring(2) -> protocol // bare "example.com"
              } else hosts += host -> protocol
            }
          }
        }
      (hosts.result(), domains.result())
    }
  }

  /** urlnormalizer-pass: identity (keeps a chain slot without effect). */
  final class PassUrlNormalizer extends UrlNormalizer {
    def normalize(url: String, scope: String): Option[String] = Some(url)
  }
}
