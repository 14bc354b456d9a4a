package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.StringType

/** URL part extraction + normalization (reference: util/URLUtil.java,
  * urlnormalizer-basic BasicURLNormalizer.java:57-350).
  *
  * Two tiers:
  *   - Column-expression versions (host/registeredDomain/tld/page/
  *     normalizeCol): pure `functions._` compositions — whole-stage
  *     codegen, no UDF ser/de, safe at 100 TB scan width.
  *   - `normalize(String)`: the full scalar normalizer (port of the
  *     basic-normalizer semantics incl. path segment resolution and
  *     percent-escape canonicalization) for use where exact reference
  *     behavior matters; exposed as a UDF by callers that need it.
  */
object Urls {

  /** hostname (with port stripped of userinfo) of a URL. */
  def host(url: Column): Column =
    regexp_extract(url, "^[a-z]+://([^/?#]+)", 1)

  /** Codegen'd static call into `Psl` — a `StaticInvoke` Catalyst
    * expression, so the call is emitted directly inside whole-stage
    * codegen (no UDF ser/de, no Row round-trip). */
  private def pslCall(fn: String, arg: Column): Column =
    ColumnBridge.column(StaticInvoke(
      Class.forName("graft.functions.Psl"), StringType, fn,
      Seq(ColumnBridge.expression(arg)), Seq(StringType)))

  /** registrable domain: one label + the longest matching public suffix
    * from the vendored PSL ICANN snapshot (URLUtil.getDomainName /
    * EffectiveTldFinder.getAssignedDomain non-strict semantics: the
    * whole host when nothing matches or the host IS a suffix). */
  def registeredDomain(url: Column): Column =
    pslCall("assignedDomainU", host(url))

  /** the matched public suffix itself, null when none matches
    * (URLUtil.getDomainSuffix). */
  def domainSuffix(url: Column): Column =
    pslCall("domainSuffixU", host(url))

  /** host-column variants for callers that pre-extract the authority
    * (Psl.cleanHost strips userinfo/port and lowercases either way). */
  def registeredDomainOfHost(hostCol: Column): Column =
    pslCall("assignedDomainU", hostCol)
  def domainSuffixOfHost(hostCol: Column): Column =
    pslCall("domainSuffixU", hostCol)

  /** Representative URL under a redirect (URLUtil.chooseRepr:370-470):
    * cross-domain keeps dst; permanent keeps src only when src is the
    * site root; temporary prefers roots, then the shorter path
    * (segment count, then length), then the shallower subdomain. */
  def chooseRepr(src: String, dst: String, temp: Boolean): String = {
    val partsRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)(.*)$".r
    def parts(u: String): Option[(String, String)] = u match {
      case partsRe(auth, file) =>
        val h = auth.takeWhile(_ != ':').toLowerCase
        Some((h, file))
      case _ => None
    }
    (parts(src), parts(dst)) match {
      case (Some((srcHost, srcFile)), Some((dstHost, dstFile))) =>
        val srcDomain = Psl.assignedDomain(srcHost)
        val dstDomain = Psl.assignedDomain(dstHost)
        val srcRoot = srcFile == "/" || srcFile.isEmpty
        val dstRoot = dstFile == "/" || dstFile.isEmpty
        if (srcDomain != dstDomain) dst
        else if (!temp) { if (srcRoot) src else dst }
        else if (srcRoot && !dstRoot) src
        else if (!srcRoot && dstRoot) dst
        else if (!srcRoot && !dstRoot && srcHost == dstHost) {
          val nSrc = srcFile.split("/").length
          val nDst = dstFile.split("/").length
          if (nSrc != nDst) { if (nDst < nSrc) dst else src }
          else if (dstFile.length < srcFile.length) dst
          else src
        } else {
          if (dstHost.split('.').length < srcHost.split('.').length) dst
          else src
        }
      case _ => dst // malformed: keep destination
    }
  }

  /** top-level domain of the host. */
  def tld(url: Column): Column =
    regexp_extract(url, "\\.([a-z]+)(?:[/?#]|$)", 1)

  /** URL with query + fragment stripped (URLUtil.getPage analog, without
    * the lowercasing the reference applies). */
  def page(url: Column): Column =
    regexp_replace(url, "[?#].*$", "")

  /** Codegen-friendly normalization subset: lowercase scheme + host,
    * strip :80, drop fragment, drop trailing '?', collapse '/./'. */
  def normalizeCol(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z]+)://", 1))
    val hostport = lower(regexp_extract(url, "^[A-Za-z]+://([^/?#]+)", 1))
    val rest = regexp_replace(url, "^[A-Za-z]+://[^/?#]*", "")
    val h = regexp_replace(hostport, ":80$", "")
    val r = regexp_replace(regexp_replace(rest, "#.*$", ""), "\\?$", "")
    val r2 = regexp_replace(r, "/\\./", "/")
    concat(scheme, lit("://"), h, r2)
  }

  // -------------------------------------------------------------------------
  // Full scalar normalizer (BasicURLNormalizer semantics)
  // -------------------------------------------------------------------------

  private val defaultPorts = Map("http" -> 80, "https" -> 443, "ftp" -> 21)

  /** RFC 3986 unreserved — the ONLY bytes whose escapes are unescaped
    * (BasicURLNormalizer.unescapePath: decoding a reserved byte like %26
    * would change semantics). */
  private def isUnreserved(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  /** Printable-ASCII chars that still must be escaped when literal
    * (BasicURLNormalizer escape sets). */
  private val unsafeLiteral = " \"<>[]{}|\\^`%"

  /** Resolve `.` and `..` path segments (BasicURLNormalizer
    * "remove relative paths" rule). */
  private[functions] def resolvePath(path: String): String = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val segs = path.split("/", -1)
    var i = 0
    while (i < segs.length) {
      segs(i) match {
        case "." | ""         => // skip (collapse duplicate slashes too)
        case ".."             => if (out.nonEmpty) out.remove(out.length - 1)
        case s                => out += s
      }
      i += 1
    }
    val trail = if (path.endsWith("/") || path.endsWith("/.") ||
      path.endsWith("/..")) "/" else ""
    val joined = out.mkString("/")
    val r = "/" + joined + (if (joined.nonEmpty) trail else "")
    if (r == "//") "/" else r
  }

  /** Canonicalize percent-escapes (BasicURLNormalizer
    * unescapePath/escapePath, TestBasicURLNormalizer:46-110 semantics):
    * unescape escapes of UNRESERVED bytes (%66→f, %2E→.), uppercase the
    * kept escapes (%2f→%2F), percent-encode stray unsafe literals —
    * controls, space, '"<>[]{}|\^`' — and non-ASCII chars as UTF-8
    * byte sequences (ñ→%C3%B1). A lone '%' not starting a valid escape
    * is encoded as %25. */
  private[functions] def canonEscapes(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        val v = Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar
        if (isUnreserved(v)) sb.append(v)
        else sb.append('%').append(s.substring(i + 1, i + 3).toUpperCase)
        i += 3
      } else if (c < 0x21 || c == 0x7F || unsafeLiteral.indexOf(c) >= 0) {
        sb.append(f"%%${c.toInt}%02X")
        i += 1
      } else if (c > 0x7F) {
        c.toString.getBytes("UTF-8").foreach(b =>
          sb.append(f"%%${b & 0xff}%02X"))
        i += 1
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Host form: only unescape unreserved escapes (example%2Ecom →
    * example.com); IDN literals (bücher.de) pass through untouched. */
  private def unescapeUnreserved(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        val v = Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar
        if (isUnreserved(v)) { sb.append(v); i += 3 }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** Full normalizer: returns None for unparseable URLs (reference drops
    * them). Pure function — safe to broadcast into a UDF. */
  def normalize(url: String): Option[String] = {
    if (url == null || url.isEmpty) return None
    val m = "^([A-Za-z][A-Za-z0-9+.-]*)://(.*)$".r.findFirstMatchIn(url.trim)
    m match {
      case None => None
      case Some(g) =>
        val scheme = g.group(1).toLowerCase
        val after = g.group(2)
        val slash = after.indexWhere(c => c == '/' || c == '?' || c == '#')
        val (authority, rest0) =
          if (slash < 0) (after, "") else (after.take(slash), after.drop(slash))
        // split off fragment entirely (reference strips ref)
        val rest1 = rest0.takeWhile(_ != '#')
        if (authority.isEmpty)
          // file: URLs legitimately carry an empty authority
          // (file:///path — RFC 8089); other schemes need a host
          return if (scheme == "file" && rest1.startsWith("/"))
            Some(s"$scheme://$rest1")
          else None
        // lowercase host (unescaping unreserved escapes, e.g.
        // example%2Ecom — TestBasicURLNormalizer:122), strip default or
        // empty port ("http://example.com:/" → no port)
        val (hostPart, portPart) = authority.lastIndexOf(':') match {
          case -1 => (authority, None)
          case i if authority.drop(i + 1).isEmpty =>
            (authority.take(i), None)
          case i if authority.drop(i + 1).forall(_.isDigit) =>
            (authority.take(i), Some(authority.drop(i + 1).toInt))
          case _ => (authority, None)
        }
        val hostLc = unescapeUnreserved(hostPart).toLowerCase
        val port = portPart match {
          case Some(p) if defaultPorts.get(scheme).contains(p) => ""
          case Some(p) => s":$p"
          case None => ""
        }
        // path/query: resolve dot segments in path, canon escapes,
        // strip a trailing lone '?'
        val qIdx = rest1.indexOf('?')
        val (path0, query) =
          if (qIdx < 0) (rest1, "") else (rest1.take(qIdx), rest1.drop(qIdx))
        val path = canonEscapes(resolvePath(if (path0.isEmpty) "/" else path0))
        val q = if (query == "?") "" else canonEscapes(query)
        Some(s"$scheme://$hostLc$port$path$q")
    }
  }
}
