package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Normalized decontamination matching (r15): a benchmark answer that
  * leaked into the corpus with only casing/punctuation drift must be
  * caught when normalization is on and (the property that motivated
  * the feature) is provably MISSED by raw matching. Covers the in-plan
  * gate (wordGrams8 + contaminationHits) and the frozen GramStore
  * path, including the `norm` sidecar round-trip and pre-sidecar
  * back-compat. */
class DecontaminateNormSpec extends AnyFunSuite with SparkSuite {

  // the benchmark answer, as the eval suite publishes it
  private val benchText =
    "the quick brown fox jumps over the lazy dog tonight again"
  // the same answer as it leaked into a crawl: title-cased, extra
  // punctuation, a double space — every token differs from the raw form
  private val driftedText =
    "The Quick, Brown FOX jumps  over the LAZY dog; tonight... Again!"

  private def df(rows: Seq[(Long, String)]) = {
    val sp = spark; import sp.implicits._
    rows.toDF("doc_id", "text")
  }

  private def hitIds(corpus: org.apache.spark.sql.DataFrame,
      bench: org.apache.spark.sql.DataFrame, norm: Boolean): Set[Long] = {
    val benchGrams = graft.QueriesPipeline
      .wordGrams8(bench, norm).select("g").distinct()
    graft.QueriesPipeline.contaminationHits(
        graft.QueriesPipeline.wordGrams8(corpus, norm), benchGrams)
      .collect().map(_.getLong(0)).toSet
  }

  test("case/punctuation-drifted contaminant is caught with " +
    "normalization on and missed with it off") {
    val bench = df(Seq((0L, benchText)))
    val corpus = df(Seq(
      (10L, driftedText),
      (11L, "completely unrelated fresh words that share no gram " +
        "with anything benchmarked here today")))
    assert(hitIds(corpus, bench, norm = false) === Set.empty,
      "raw matching should MISS the format-drifted leak")
    assert(hitIds(corpus, bench, norm = true) === Set(10L),
      "normalized matching should catch exactly the drifted leak")
  }

  test("normalization folds identically on both sides: a verbatim " +
    "leak still matches under norm") {
    val bench = df(Seq((0L, benchText)))
    val corpus = df(Seq((20L, benchText)))
    assert(hitIds(corpus, bench, norm = true) === Set(20L))
    assert(hitIds(corpus, bench, norm = false) === Set(20L))
  }

  test("GramStore: norm sidecar round-trips, normalized store catches " +
    "the drift, raw store misses it, missing sidecar reads raw") {
    val bench = df(Seq((0L, benchText)))
    val increment = df(Seq((30L, driftedText)))

    val normDir = Files.createTempDirectory("gram-norm").toString
    GramStore.install(bench, normDir, buckets = 2, normalize = true)
    assert(GramStore.normalized(normDir))
    val normHits = GramStore.hits(increment,
        GramStore.open(spark, normDir), GramStore.normalized(normDir))
      .collect().map(_.getLong(0)).toSet
    assert(normHits === Set(30L))

    val rawDir = Files.createTempDirectory("gram-raw").toString
    GramStore.install(bench, rawDir, buckets = 2)
    assert(!GramStore.normalized(rawDir))
    val rawHits = GramStore.hits(increment,
        GramStore.open(spark, rawDir), GramStore.normalized(rawDir))
      .collect().map(_.getLong(0)).toSet
    assert(rawHits === Set.empty)

    // pre-r15 store layout: no `norm` sidecar → raw matching (the only
    // behavior those stores ever had)
    Files.delete(java.nio.file.Paths.get(rawDir, "norm"))
    assert(GramStore.isStore(rawDir) && !GramStore.normalized(rawDir))
  }

  test("re-installing the same directory with a different bucket " +
    "count re-registers: open() serves the sidecar's count, not a " +
    "stale catalog entry") {
    val dir = Files.createTempDirectory("gram-rebucket").toString
    val bench = df((0 until 4).map(i =>
      (i.toLong, (0 until 10).map(w => s"b${i}w$w").mkString(" "))))
    GramStore.install(bench, dir, buckets = 2)
    GramStore.open(spark, dir) // registers CLUSTERED BY 2 in the catalog
    GramStore.install(bench, dir, buckets = 4)
    GramStore.open(spark, dir).collect() // must NOT serve the 2-bucket spec
    val t = spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith("graft_gramstore_"))
      .find(n => spark.table(n).inputFiles.headOption
        .exists(_.contains(dir.split("/").last)))
      .getOrElse(fail("store table not registered"))
    val spec = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(t))
      .bucketSpec
    assert(spec.map(_.numBuckets).contains(4),
      s"stale bucket spec survived re-install: $spec")
  }
}
