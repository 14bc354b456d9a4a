package graft.plugins

/** URLExemptionFilter impls (urlfilter-ignoreexempt,
  * ExemptionUrlFilter.java:54-70): when `db.ignore.external.links` is
  * dropping cross-host outlinks, a URL matching the exemption rules is
  * kept anyway — the reference reuses the regex-urlfilter rule format
  * and exempts a toUrl its chain ACCEPTS. */
object NoExemptions extends Extensions.ExemptionFilter {
  def isExempted(fromUrl: String, toUrl: String): Boolean = false
}

/** Rule-file-driven exemptions: same `+pattern`/`-pattern` line format
  * as regex-urlfilter.txt; a toUrl the chain accepts is exempt. */
final class RegexExemptionFilter(rules: Iterator[String])
  extends Extensions.ExemptionFilter {
  private val chain = graft.net.RegexUrlFilter.parse(rules)
  def isExempted(fromUrl: String, toUrl: String): Boolean =
    chain.accepts(toUrl)
}
