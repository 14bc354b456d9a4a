package graft.net

/** robots.txt rules (the reference delegates to crawler-commons
  * SimpleRobotRulesParser from FetcherThread; this is the standard
  * REP subset: user-agent groups, Allow/Disallow with longest-match
  * precedence, `*` wildcards, `$` end anchor, Crawl-delay).
  *
  * Group selection: the group whose User-agent token is the longest
  * substring of the caller's agent wins; `*` is the fallback. */
object Robots {

  final case class Rule(allow: Boolean, pattern: String) {
    @transient private lazy val regex = {
      val sb = new StringBuilder("^")
      pattern.foreach {
        case '*' => sb.append(".*")
        case '$' => sb.append("$")
        case c if "\\.[]{}()+-?^|".indexOf(c) >= 0 =>
          sb.append('\\').append(c)
        case c => sb.append(c)
      }
      sb.toString.r
    }
    def matches(path: String): Boolean =
      regex.pattern.matcher(path).lookingAt()
    /** specificity = literal pattern length (longest-match precedence) */
    def specificity: Int = pattern.length
  }

  final case class RobotRules(rules: Seq[Rule],
      crawlDelayMs: Option[Long],
      sitemaps: Seq[String] = Nil) extends Serializable {
    /** Longest matching rule decides; no match = allowed. */
    def isAllowed(path: String): Boolean = {
      val p = if (path.isEmpty) "/" else path
      rules.filter(_.matches(p))
        .sortBy(r => (-r.specificity, !r.allow)) match {
        case Seq() => true
        case winner +: _ => winner.allow
      }
    }
  }

  val AllowAll: RobotRules = RobotRules(Nil, None)

  /** Parse for a specific agent. */
  def parse(content: String, agent: String): RobotRules = {
    final case class Group(agents: Seq[String], rules: Seq[Rule],
        delay: Option[Long])
    var groups = Vector.empty[Group]
    var curAgents = Vector.empty[String]
    var curRules = Vector.empty[Rule]
    var curDelay: Option[Long] = None
    var inGroup = false
    var sitemaps = Vector.empty[String]
    def flush(): Unit = {
      if (curAgents.nonEmpty)
        groups :+= Group(curAgents, curRules, curDelay)
      curAgents = Vector.empty; curRules = Vector.empty; curDelay = None
    }
    content.linesIterator.foreach { raw =>
      val line = (raw.indexOf('#') match {
        case -1 => raw
        case i => raw.take(i)
      }).trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.take(colon).trim.toLowerCase
        val value = line.drop(colon + 1).trim
        key match {
          case "user-agent" =>
            if (inGroup) { flush(); inGroup = false }
            curAgents :+= value.toLowerCase
          case "allow" | "disallow" =>
            inGroup = true
            if (value.nonEmpty || key == "allow")
              curRules :+= Rule(key == "allow", value)
            // empty Disallow = allow everything (no rule)
          case "crawl-delay" =>
            inGroup = true
            curDelay = scala.util.Try(
              (value.toDouble * 1000).toLong).toOption
          case "sitemap" => // global directive, any group
            if (value.nonEmpty) sitemaps :+= value
          case _ => inGroup = true
        }
      }
    }
    flush()
    val a = agent.toLowerCase
    val chosen = groups
      .flatMap(g => g.agents.filter(t => t != "*" && a.contains(t))
        .maxByOption(_.length).map(t => (t.length, g)))
      .maxByOption(_._1).map(_._2)
      .orElse(groups.find(_.agents.contains("*")))
    chosen.map(g => RobotRules(g.rules, g.delay, sitemaps))
      .getOrElse(RobotRules(Nil, None, sitemaps))
  }
}
