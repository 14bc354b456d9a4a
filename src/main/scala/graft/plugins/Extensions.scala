package graft.plugins

import graft.schemas.{CrawlDatum, Outlink, ParseDataRow}

/** §2.9 — the plugin/extension-point surface
  * (nutch-extensionpoints/plugin.xml defines 12 extension points; each
  * maps to a Scala trait seam here or in its home package).
  *
  * | Reference extension point | Trait | Impls |
  * |---|---|---|
  * | URLFilter            | net.UrlFilter            | Regex/Prefix/Suffix/Fast/Domain/DomainDenylist/Automaton/Validator |
  * | URLNormalizer        | plugins.UrlNormalizer    | Basic + Normalizers.{Regex,Querystring,Slash,Ajax,Host,Protocol,Pass} |
  * | URLExemptionFilter   | Extensions.ExemptionFilter | Exemptions (urlfilter-ignoreexempt) |
  * | Protocol             | ops.Fetch.Protocol       | MockProtocol/HttpProtocol/FileProtocol |
  * | Parser               | plugins.Parser           | HtmlTokenizerParser (wraps Html.scala tokenizer) + ZipParse/JsParse/ExtParser |
  * | HtmlParseFilter      | plugins.ParseFilter      | parsefilter-regex/naive-bayes analogs (QueriesPlugins); Parse.Config.debugDom = parsefilter-debug |
  * | ScoringFilter        | crawl.ScoringFilter      | Noop/Opic; Parse.ScoringMetadata = scoring-metadata hops |
  * | IndexingFilter       | plugins.IndexingFilter   | Basic/Static/Tld/UrlMeta/Metadata/Replace/Arbitrary (+ anchor/more/metatags scalars; Index.Config.jexlFilter = index-jexl-filter) |
  * | IndexWriter          | ops.IndexWriters.IndexWriter | JsonLines/Csv/HttpBulk/Dialect(Solr XML, ES _bulk)/PartitionedLog |
  * | Exchange             | ops.IndexWriters.routeColumn | first-match rules (exchange-jexl) |
  * | FetchSchedule        | crawl.FetchSchedule      | Default/Adaptive/MimeAdaptive |
  * | Signature            | (doc_fingerprint / TextAnalysis.md5Hex) | TextProfile/MD5 |
  * | Publisher            | plugins.Publishers.Publisher | HttpPublisher (publish-rabbitmq wire shape) + CollectingPublisher (tests); START/END raised by ops.Fetch |
  *
  * Unlike the reference's classloader-per-plugin machinery, Spark ships
  * one fat closure — the seam that matters is the TRAIT (so deployments
  * swap implementations at session-build time), not dynamic loading.
  */
object Extensions {

  /** URL normalization chain seam (URLNormalizers.java scopes). */
  trait UrlNormalizer extends Serializable {
    def normalize(url: String, scope: String): Option[String]
  }

  final class BasicUrlNormalizer extends UrlNormalizer {
    def normalize(url: String, scope: String): Option[String] =
      graft.functions.Urls.normalize(url)
  }

  /** The reference's nine normalizer scopes
    * (URLNormalizers.java:97-119). Each pipeline stage normalizes under
    * its own scope; a scope without a configured chain falls back to
    * the default chain (URLNormalizers.java:156-160). */
  object Scope {
    val Default = "default"
    val Partition = "partition"
    val GenerateHostCount = "generate_host_count"
    val Fetcher = "fetcher"
    val Crawldb = "crawldb"
    val Linkdb = "linkdb"
    val Inject = "inject"
    val Outlink = "outlink"
    val Indexer = "indexer"
    val All: Seq[String] = Seq(Default, Partition, GenerateHostCount,
      Fetcher, Crawldb, Linkdb, Inject, Outlink, Indexer)
  }

  /** Content → parse result seam (Parser extension point). */
  trait Parser extends Serializable {
    def parse(url: String, base: String, bytes: Array[Byte],
        contentType: String): (Int, String, String, Seq[Outlink])
  }

  final class HtmlTokenizerParser(cfg: graft.ops.Parse.Config =
      graft.ops.Parse.Config()) extends Parser {
    def parse(url: String, base: String, bytes: Array[Byte],
        contentType: String): (Int, String, String, Seq[Outlink]) =
      graft.ops.Parse.parsePage(base, bytes, contentType, cfg)
  }

  /** Post-parse hook (HtmlParseFilter extension point) — open seam. */
  trait ParseFilter extends Serializable {
    def filter(pd: ParseDataRow, text: String): (ParseDataRow, String)
  }

  /** Document-field hook (IndexingFilter extension point). */
  trait IndexingFilter extends Serializable {
    /** Return None to drop the document from indexing. */
    def filter(doc: Map[String, String], url: String,
        datum: CrawlDatum): Option[Map[String, String]]
  }

  /** index-basic BasicIndexingFilter.java: contributes url/host fields. */
  final class BasicIndexingFilter extends IndexingFilter {
    def filter(doc: Map[String, String], url: String,
        datum: CrawlDatum): Option[Map[String, String]] =
      Some(doc + ("url" -> url) ++
        graft.net.UrlParts.host(url).map("host" -> _))
  }

  /** URLExemptionFilter extension point: exempt specific cross-domain
    * URLs from the db.ignore.external rules (urlfilter-ignoreexempt). */
  trait ExemptionFilter extends Serializable {
    def isExempted(fromUrl: String, toUrl: String): Boolean
  }

  /** In-memory registry used by tests/deployments to assemble chains by
    * name (PluginRepository analog, minus classloaders). */
  final case class Registry(
      urlFilters: Seq[graft.net.UrlFilter] = Nil,
      normalizers: Seq[UrlNormalizer] = Seq(new BasicUrlNormalizer),
      // per-scope override chains; scopes not present here use
      // `normalizers` (the default-scope chain), matching
      // URLNormalizers.java:156-160 fallback
      scopedNormalizers: Map[String, Seq[UrlNormalizer]] = Map.empty,
      parser: Parser = new HtmlTokenizerParser(),
      scoring: graft.crawl.ScoringFilter = graft.crawl.OpicScoring,
      schedule: graft.crawl.FetchSchedule =
        graft.crawl.DefaultFetchSchedule(graft.crawl.ScheduleConfig()),
      indexingFilters: Seq[IndexingFilter] = Seq(new BasicIndexingFilter)) {

    def filterChain: graft.net.UrlFilterChain =
      new graft.net.UrlFilterChain(urlFilters)

    /** The chain for a scope (default-scope fallback). */
    def normalizerChain(scope: String): Seq[UrlNormalizer] =
      scopedNormalizers.getOrElse(scope, normalizers)

    def normalize(url: String, scope: String): Option[String] =
      normalizerChain(scope).foldLeft(Option(url))((u, n) =>
        u.flatMap(n.normalize(_, scope)))

    def normalizeAndFilter(url: String, scope: String): Option[String] =
      normalize(url, scope).flatMap(filterChain.filter)
  }
}
