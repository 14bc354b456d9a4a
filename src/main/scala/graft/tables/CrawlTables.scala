package graft.tables

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}

import graft.schemas._

/** Parquet-backed crawl tables with the reference's copy-on-write install
  * semantics (CrawlDb.java:163-181 install/swap): every update writes a
  * NEW generation directory, then atomically swaps `current` → `old` →
  * gone. Readers of the previous generation are never disturbed — the
  * same discipline that lets a 1000-executor job read `current` while
  * updatedb writes the next one. */
object Install {

  /** Write-then-swap: `ds` → <table>/.tmp-<nonce>, then
    * current → old (replacing old), tmp → current. */
  def install[T](ds: Dataset[T], tableDir: String, nonce: String): Unit = {
    val dir = Paths.get(tableDir)
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".tmp-$nonce")
    ds.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val current = dir.resolve("current")
    val old = dir.resolve("old")
    if (Files.exists(old)) deleteRecursively(old)
    if (Files.exists(current))
      Files.move(current, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, current, StandardCopyOption.ATOMIC_MOVE)
  }

  def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).forEach(deleteRecursively(_))
    Files.deleteIfExists(p)
  }
}

/** What the conductor needs from a CrawlDb, layout-agnostic: plain
  * generation-swapped parquet ([[CrawlDbTable]]) or the url-bucketed
  * layout ([[BucketedCrawlDbTable]]). */
trait CrawlDbStore {
  def read(): Dataset[CrawlRow]
  def install(next: Dataset[CrawlRow], nonce: String): Unit
}

object CrawlDbStore {
  /** Open a CrawlDb in WHATEVER layout is on disk: a GENERATION
    * pointer means the url-bucketed layout (bucket count from the
    * BUCKETS sidecar the installer writes), otherwise the plain
    * generation-swapped layout. Every single-step entry point (CLI
    * verbs, REST readers) must open through this — a plain
    * CrawlDbTable pointed at a bucketed root silently reads EMPTY,
    * and a plain install would write a `current` the bucketed
    * conductor ignores (split-brain). */
  def open(spark: SparkSession, dir: String): CrawlDbStore = {
    val gen = Paths.get(dir, "GENERATION")
    if (Files.exists(gen)) {
      val sidecar = Paths.get(dir, "BUCKETS")
      val n =
        if (Files.exists(sidecar)) Files.readString(sidecar).trim.toInt
        else 32
      new BucketedCrawlDbTable(spark, dir, n)
    } else new CrawlDbTable(spark, dir)
  }
}

/** The CrawlDb: url → CrawlDatum at <dir>/current (SURVEY §1.1). */
final class CrawlDbTable(spark: SparkSession, dir: String)
    extends CrawlDbStore {
  import spark.implicits._

  def exists: Boolean = Files.exists(Paths.get(dir, "current"))

  def read(): Dataset[CrawlRow] =
    if (exists) spark.read.parquet(s"$dir/current").as[CrawlRow]
    else spark.emptyDataset[CrawlRow]

  def install(next: Dataset[CrawlRow], nonce: String): Unit =
    Install.install(next, dir, nonce)
}

/** The CrawlDb over the url-bucketed layout ([[Bucketed]]): every
  * generation is a bucketed catalog table under `<dir>/g<N>`, with a
  * GENERATION pointer file playing the role of the `current` symlink.
  * Same copy-on-write discipline as [[Install]] — a new generation is
  * fully written before the pointer moves, the previous generation
  * survives one swap for in-flight readers, older ones are dropped.
  *
  * What it buys at scale: every url-keyed join against the CrawlDb —
  * the indexing cogroup, dedup merge-back, linkdb-side joins — reads
  * the db side WITHOUT an Exchange (the bucket layout already
  * satisfies the join's required distribution), so the 10^9-row side
  * of the per-round joins never reshuffles; only the small per-round
  * segment side moves. */
final class BucketedCrawlDbTable(spark: SparkSession, dir: String,
    val buckets: Int) extends CrawlDbStore {
  import spark.implicits._

  private val tag =
    "graft_crawldb_" + dir.replaceAll("[^A-Za-z0-9]", "_").takeRight(48) +
      "_" + Integer.toHexString(dir.hashCode)
  private def genFile = Paths.get(dir, "GENERATION")
  private def generation: Long =
    if (Files.exists(genFile)) Files.readString(genFile).trim.toLong else 0L
  private def tableName(g: Long) = s"${tag}_g$g"

  def read(): Dataset[CrawlRow] = {
    val g = generation
    if (g == 0L) spark.emptyDataset[CrawlRow]
    else {
      // the GENERATION pointer survives the process but saveAsTable's
      // catalog entry is session-scoped: a NEW session resuming this
      // root re-registers the generation's parquet before reading, so
      // the bucketed layout (and its Exchange-free joins) carries
      // across JVMs like the plain layout's <dir>/current does.
      // Registration MUST use the count the generation was written
      // with (the BUCKETS sidecar) — a caller-supplied mismatch would
      // silently mis-declare the layout and corrupt bucket pruning
      if (!spark.catalog.tableExists(tableName(g))) {
        val sidecar = Paths.get(dir, "BUCKETS")
        val n =
          if (Files.exists(sidecar)) Files.readString(sidecar).trim.toInt
          else buckets
        Bucketed.register(spark, tableName(g), s"$dir/g$g", n)
      }
      spark.table(tableName(g)).as[CrawlRow]
    }
  }

  /** One-way, idempotent migration from the plain generation-swapped
    * layout: an existing `<dir>/current` (and no GENERATION pointer)
    * is rewritten as bucketed generation 1, then the plain dirs are
    * dropped — same write-before-pointer discipline as [[install]], so
    * a crash mid-migration leaves either the untouched plain layout or
    * a complete bucketed one, never a torn state. */
  def migrateFromPlain(): Unit = {
    val cur = Paths.get(dir, "current")
    if (generation == 0L && Files.exists(cur))
      install(spark.read.parquet(cur.toString).as[CrawlRow], "migrate")
    // cleanup is RETRIED on every call, not only the migrating one: a
    // crash between the pointer swap above and the deletes below must
    // not leave a stale plain `current` that a mis-routed plain reader
    // would serve as live data forever
    if (generation > 0L) {
      if (Files.exists(cur)) Install.deleteRecursively(cur)
      val old = Paths.get(dir, "old")
      if (Files.exists(old)) Install.deleteRecursively(old)
    }
  }

  def install(next: Dataset[CrawlRow], nonce: String): Unit = {
    val g = generation + 1
    Files.createDirectories(Paths.get(dir))
    Bucketed.install(next.toDF(), tableName(g), s"$dir/g$g", buckets)
    // BUCKETS sidecar: lets layout-agnostic opens (CrawlDbStore.open)
    // re-register the table with the right CLUSTERED BY in a new JVM
    Files.writeString(Paths.get(dir, "BUCKETS"), buckets.toString)
    // pointer swap mirrors Install's discipline: write-then-atomic-move,
    // never an in-place rewrite a crash could truncate
    val tmp = Paths.get(dir, s".GENERATION-$nonce")
    Files.writeString(tmp, g.toString)
    Files.move(tmp, genFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // keep g-1 for in-flight readers (the `old` generation); drop g-2
    if (g >= 3) {
      spark.sql(s"DROP TABLE IF EXISTS `${tableName(g - 2)}`")
      Install.deleteRecursively(Paths.get(dir, s"g${g - 2}"))
    }
  }
}

/** One segment directory with its parquet parts (SURVEY §1.1; segment
  * naming Generator.java:58-63). */
final class Segment(spark: SparkSession, val dir: String) {
  import spark.implicits._

  def writeGenerate(ds: Dataset[GenerateEntry]): Unit =
    ds.write.mode(SaveMode.Overwrite).parquet(s"$dir/crawl_generate")
  def writeFetch(ds: Dataset[CrawlRow]): Unit =
    ds.write.mode(SaveMode.Overwrite).parquet(s"$dir/crawl_fetch")
  def writeContent(ds: Dataset[ContentRow]): Unit =
    ds.write.mode(SaveMode.Overwrite).parquet(s"$dir/content")
  def writeCrawlParse(ds: Dataset[CrawlRow]): Unit =
    ds.write.mode(SaveMode.Overwrite).parquet(s"$dir/crawl_parse")
  def writeParseData(ds: Dataset[ParseDataRow]): Unit =
    ds.write.mode(SaveMode.Overwrite).parquet(s"$dir/parse_data")
  def writeParseText(ds: Dataset[ParseTextRow]): Unit =
    ds.write.mode(SaveMode.Overwrite).parquet(s"$dir/parse_text")

  def generate: Dataset[GenerateEntry] =
    spark.read.parquet(s"$dir/crawl_generate").as[GenerateEntry]
  def fetch: Dataset[CrawlRow] =
    spark.read.parquet(s"$dir/crawl_fetch").as[CrawlRow]
  def content: Dataset[ContentRow] =
    spark.read.parquet(s"$dir/content").as[ContentRow]
  def crawlParse: Dataset[CrawlRow] =
    spark.read.parquet(s"$dir/crawl_parse").as[CrawlRow]
  def parseData: Dataset[ParseDataRow] =
    spark.read.parquet(s"$dir/parse_data").as[ParseDataRow]
  def parseText: Dataset[ParseTextRow] =
    spark.read.parquet(s"$dir/parse_text").as[ParseTextRow]
}

/** Opt-in url-bucketed table layout — the 100 TB co-located-join path.
  * Two tables written with the same bucket count on `url` join with
  * ZERO Exchange on either side (bucket layout satisfies the join's
  * required distribution), which turns the per-round url-keyed joins —
  * dedup merge-back, indexing cogroup, linkdb merge — from
  * both-sides-shuffled into local merges; at 10^9-row CrawlDb scale
  * the avoided shuffle dominates the round's cost. Bucket metadata
  * lives in the session catalog (saveAsTable is how Spark records it);
  * `path` keeps the data external under the caller's table directory,
  * so the copy-on-write Install discipline carries over by writing a
  * new generation table name and dropping the old one.
  * BucketedSpec asserts the Exchange-free plan against a plain-parquet
  * A/B of the same join. */
object Bucketed {

  def install[T](ds: Dataset[T], tableName: String, path: String,
      buckets: Int): Unit = {
    val spark = ds.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$tableName`")
    ds.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "url").sortBy("url")
      .option("path", path).format("parquet")
      .saveAsTable(tableName)
  }

  def read(spark: SparkSession, tableName: String)
      : org.apache.spark.sql.DataFrame =
    spark.table(tableName)

  /** Re-register an EXISTING bucketed parquet directory (written by
    * [[install]] in an earlier session) under `tableName` without
    * rewriting data: the files already carry saveAsTable's bucket-id
    * naming, so a CREATE TABLE with the matching CLUSTERED BY spec
    * restores the bucket metadata a new session's catalog lost. */
  def register(spark: SparkSession, tableName: String, path: String,
      buckets: Int): Unit = {
    val schema = spark.read.parquet(path).schema.toDDL
    spark.sql(s"""CREATE TABLE IF NOT EXISTS `$tableName` ($schema)
      USING parquet OPTIONS (path '$path')
      CLUSTERED BY (url) SORTED BY (url) INTO $buckets BUCKETS""")
  }
}

/** The LinkDb: url → bounded inlink list (LinkDb.java, FIXTURES §A5). */
final case class Inlink(fromUrl: String, anchor: String)
final case class LinkRow(url: String, inlinks: Seq[Inlink])

final class LinkDbTable(spark: SparkSession, dir: String) {
  import spark.implicits._

  def exists: Boolean = Files.exists(Paths.get(dir, "current"))

  def read(): Dataset[LinkRow] =
    if (exists) spark.read.parquet(s"$dir/current").as[LinkRow]
    else spark.emptyDataset[LinkRow]

  def install(next: Dataset[LinkRow], nonce: String): Unit =
    Install.install(next, dir, nonce)
}

/** The HostDb: host → census/failure counters (UpdateHostDbJob). */
final class HostDbTable(spark: SparkSession, dir: String) {
  import spark.implicits._

  def exists: Boolean = Files.exists(Paths.get(dir, "current"))

  def read(): Dataset[graft.ops.UpdateHostDb.HostRow] =
    if (exists) spark.read.parquet(s"$dir/current")
      .as[graft.ops.UpdateHostDb.HostRow]
    else spark.emptyDataset[graft.ops.UpdateHostDb.HostRow]

  def install(next: Dataset[graft.ops.UpdateHostDb.HostRow],
      nonce: String): Unit =
    Install.install(next, dir, nonce)
}
