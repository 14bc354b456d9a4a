package graft.functions

import java.util.Locale

import org.apache.spark.unsafe.types.UTF8String

/** Public-suffix-list engine for registrable-domain extraction.
  *
  * Reference semantics: util/URLUtil.java:100-185 (`getDomainName`,
  * `getDomainSuffix`) delegate to crawler-commons' EffectiveTldFinder
  * over the ICANN section of the public suffix list
  * (https://publicsuffix.org/list/), non-strict mode: a host that ends
  * in no known suffix (or IS a suffix) is returned whole.
  *
  * The rule file is a vendored snapshot of the PSL ICANN section
  * (`resources/graft/public_suffix_icann.dat`, ~7.4k rules incl. 18
  * wildcard and 8 exception rules). Rules are normalized to punycode at
  * load; IDN hosts are matched in punycode but returned in their
  * original form (TestURLUtil.java: `example.flå.no`, `example.栃木.jp`).
  *
  * Matching is the PSL prevailing-rule algorithm specialized to a
  * longest-suffix scan: candidates are the host's label-boundary
  * suffixes from longest to shortest; at each, exception rules win
  * (the exception itself is the registrable domain), then exact rules,
  * then wildcard rules (`*.P` matches a candidate of exactly one label
  * plus `P`). The fast path allocates nothing but the result substring.
  *
  * Called from whole-stage codegen via `StaticInvoke` (see
  * `Urls.registeredDomain`) — no UDF ser/de, stays inside codegen.
  */
object Psl {

  final case class Rules(
      exact: java.util.HashSet[String],
      wildcard: java.util.HashSet[String],
      exception: java.util.HashSet[String])

  private def toAsciiLabel(l: String): String =
    if (l.forall(_ < 0x80)) l
    else try java.net.IDN.toASCII(l) catch { case _: Exception => l }

  private def toAscii(name: String): String =
    if (name.forall(_ < 0x80)) name
    else name.split('.').map(toAsciiLabel).mkString(".")

  lazy val rules: Rules = {
    val exact = new java.util.HashSet[String](16384)
    val wild = new java.util.HashSet[String](64)
    val exc = new java.util.HashSet[String](32)
    val in = getClass.getResourceAsStream("/graft/public_suffix_icann.dat")
    require(in != null, "missing resource graft/public_suffix_icann.dat")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      for (line0 <- src.getLines()) {
        val line = line0.trim
        if (line.nonEmpty && !line.startsWith("//")) {
          if (line.startsWith("!")) exc.add(toAscii(line.substring(1)))
          else if (line.startsWith("*.")) wild.add(toAscii(line.substring(2)))
          else exact.add(toAscii(line))
        }
      }
    } finally src.close()
    Rules(exact, wild, exc)
  }

  /** Strip userinfo, port, trailing dot; lowercase. Accepts either a bare
    * host or an authority component. */
  private def cleanHost(raw: String): String = {
    var h = raw
    val at = h.lastIndexOf('@')
    if (at >= 0) h = h.substring(at + 1)
    val colon = h.indexOf(':')
    if (colon >= 0) h = h.substring(0, colon)
    if (h.endsWith(".")) h = h.substring(0, h.length - 1)
    h.toLowerCase(Locale.ROOT)
  }

  /** Registrable domain of a host/authority (EffectiveTldFinder
    * .getAssignedDomain(host, strict=false, icannOnly=true) semantics):
    * one label + the longest matching public suffix; the whole host when
    * no suffix matches or the host IS a suffix. */
  def assignedDomain(rawHost: String): String = {
    if (rawHost == null) return null
    val host = cleanHost(rawHost)
    if (host.isEmpty) return host
    if (host.forall(_ < 0x80)) asciiScan(host, returnSuffix = false)
    else idnScan(host, returnSuffix = false)
  }

  /** The matched public suffix itself, or null when none matches
    * (URLUtil.getDomainSuffix returns null for e.g. IP hosts). */
  def domainSuffix(rawHost: String): String = {
    if (rawHost == null) return null
    val host = cleanHost(rawHost)
    if (host.isEmpty) return null
    val r =
      if (host.forall(_ < 0x80)) asciiScan(host, returnSuffix = true)
      else idnScan(host, returnSuffix = true)
    if (r != null && r.isEmpty) null else r
  }

  /** Longest-first scan over label-boundary suffixes of an ASCII host.
    * returnSuffix=false → registrable domain ("" impossible; whole host
    * on no-match). returnSuffix=true → matched suffix ("" on no-match). */
  private def asciiScan(host: String, returnSuffix: Boolean): String = {
    val r = rules
    var start = 0 // candidate = host.substring(start)
    while (start < host.length) {
      val cand =
        if (start == 0) host else host.substring(start)
      if (r.exception.contains(cand)) {
        // exception rule: the exception itself is registrable; its
        // suffix is the exception minus the leftmost label
        return if (returnSuffix) cand.substring(cand.indexOf('.') + 1)
        else cand
      }
      val isExact = r.exact.contains(cand)
      val isWild = !isExact && {
        val d = cand.indexOf('.')
        d >= 0 && r.wildcard.contains(cand.substring(d + 1))
      }
      if (isExact || isWild) {
        if (returnSuffix) return cand
        return if (start == 0) host
        else {
          // one more label to the left of the suffix
          val prevDot = host.lastIndexOf('.', start - 2)
          host.substring(prevDot + 1)
        }
      }
      val next = host.indexOf('.', start)
      if (next < 0) return if (returnSuffix) "" else host
      start = next + 1
    }
    if (returnSuffix) "" else host
  }

  /** IDN path: match in punycode, answer in original labels. */
  private def idnScan(host: String, returnSuffix: Boolean): String = {
    val labels = host.split('.')
    val ascii = labels.map(toAsciiLabel)
    val r = rules
    var i = 0
    while (i < labels.length) {
      val cand = ascii.drop(i).mkString(".")
      val orig = () => labels.drop(i).mkString(".")
      if (r.exception.contains(cand)) {
        return if (returnSuffix) labels.drop(i + 1).mkString(".") else orig()
      }
      val isExact = r.exact.contains(cand)
      val isWild = !isExact && i + 1 < labels.length &&
        r.wildcard.contains(ascii.drop(i + 1).mkString("."))
      if (isExact || isWild) {
        if (returnSuffix) return orig()
        return if (i == 0) host else labels.drop(i - 1).mkString(".")
      }
      i += 1
    }
    if (returnSuffix) "" else host
  }

  // ---- UTF8String entry points for StaticInvoke (codegen calls these
  // as static forwarders on class graft.functions.Psl) ----

  def assignedDomainU(host: UTF8String): UTF8String =
    if (host == null) null else UTF8String.fromString(assignedDomain(host.toString))

  def domainSuffixU(host: UTF8String): UTF8String = {
    if (host == null) return null
    val s = domainSuffix(host.toString)
    if (s == null) null else UTF8String.fromString(s)
  }
}
