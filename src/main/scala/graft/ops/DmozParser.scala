package graft.ops

import java.io.InputStream

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

/** DMOZ/ODP RDF dump → seed URL list (reference
  * tools/DmozParser.java:119-327): stream the RDF, take each
  * ExternalPage's `about` URL, filtered by
  *   - the adult gate: pages under a Topic whose `r:id` starts with
  *     `Top/Adult` are dropped unless opted in,
  *   - an optional topic-prefix set (the reference builds
  *     `^(t1|t2|…).*` from -topicFile lines),
  *   - a 1/subsetDenom deterministic sample keyed on md5(url) xor a
  *     skew (DmozParser.java:168-174) — the md5 fold here is the first
  *     four digest bytes big-endian, a documented stand-in for
  *     Hadoop's MD5Hash.hashCode with identical uniformity.
  *
  * StAX pull parsing keeps memory flat over multi-GB dumps; the output
  * feeds Inject like any other seed file. */
object DmozParser {

  final case class Config(
      subsetDenom: Int = 1,
      includeAdult: Boolean = false,
      topicPrefixes: Seq[String] = Nil,
      hashSkew: Int = 0)

  private def urlHash(url: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(url.getBytes("UTF-8"))
    ((d(0) & 0xff) << 24) | ((d(1) & 0xff) << 16) |
      ((d(2) & 0xff) << 8) | (d(3) & 0xff)
  }

  /** Parse one RDF stream to the kept URLs, streaming. */
  def parse(in: InputStream, cfg: Config = Config()): Iterator[String] = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
      java.lang.Boolean.FALSE)
    val r = f.createXMLStreamReader(in)
    var curSection = ""
    new Iterator[String] {
      private var nextUrl: Option[String] = None
      private def attr(name: String): Option[String] =
        (0 until r.getAttributeCount)
          .find(i => r.getAttributeLocalName(i) == name)
          .map(r.getAttributeValue)
      private def advance(): Unit = {
        nextUrl = None
        while (nextUrl.isEmpty && r.hasNext) {
          if (r.next() == XMLStreamConstants.START_ELEMENT) {
            r.getLocalName match {
              case "Topic" => curSection = attr("id").getOrElse("")
              case "ExternalPage" =>
                val keep =
                  (cfg.includeAdult || !curSection.startsWith("Top/Adult")) &&
                    (cfg.topicPrefixes.isEmpty ||
                      cfg.topicPrefixes.exists(curSection.startsWith)) &&
                    attr("about").exists { u =>
                      math.abs(urlHash(u) ^ cfg.hashSkew) %
                        cfg.subsetDenom == 0
                    }
                if (keep) nextUrl = attr("about")
              case _ => ()
            }
          }
        }
        if (nextUrl.isEmpty) r.close()
      }
      advance()
      def hasNext: Boolean = nextUrl.isDefined
      def next(): String = {
        val u = nextUrl.get
        advance()
        u
      }
    }
  }
}
