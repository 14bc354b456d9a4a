package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** The bucketed frozen-corpus dedup store: verdicts match the in-plan
  * derivation on planted exact/near/new documents, the store survives
  * a catalog wipe, and — the point of the store — each increment's
  * probe joins read BOTH store tables in place: every Exchange in the
  * plan carries increment columns only. */
class DedupStoreSpec extends AnyFunSuite with SparkSuite {

  private def text(i: Int): String =
    (0 until 30).map(w => s"w${i}x$w").mkString(" ")

  private def docs(rows: Seq[(Long, String)]) = {
    val sp = spark; import sp.implicits._
    rows.toDF("doc_id", "text")
  }

  test("increment verdicts: planted exact copies drop_exact, appended-" +
    "word rewrites drop_near, fresh docs keep; store survives a " +
    "catalog wipe") {
    val root = Files.createTempDirectory("dedup-store").toString
    val store = docs((0 until 40).map(i => (i.toLong, text(i))))
    DedupStore.install(store, root, buckets = 4)

    // fresh catalog = fresh JVM
    spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith("graft_dedupstore_"))
      .foreach(n => spark.sql(s"DROP TABLE `$n`"))
    val (sigs, bands) = DedupStore.open(spark, root, buckets = 4)

    val increment = docs(
      (100 until 110).map(i => (i.toLong, text(i))) ++ // fresh
        Seq(200L -> text(3), 201L -> text(7)) ++ // exact store copies
        // near rewrites: one appended word -> shingle superset,
        // jaccard 28/31; deterministic hashing makes the band match
        // and >= 0.5 signature agreement a fixed outcome
        Seq(300L -> (text(5) + " extraword"),
          301L -> (text(9) + " anotherword")))
    val got = DedupStore.dedupIncrement(increment, sigs, bands)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap

    assert((100 until 110).forall(i => got(i.toLong) == "keep"), got)
    assert(got(200L) == "drop_exact" && got(201L) == "drop_exact", got)
    assert(got(300L) == "drop_near" && got(301L) == "drop_near", got)
  }

  test("the store never moves: every Exchange in the increment plan " +
    "carries increment columns, none carries store_sig or s_m*") {
    val root = Files.createTempDirectory("dedup-store-plan").toString
    DedupStore.install(docs((0 until 60).map(i => (i.toLong, text(i)))),
      root, buckets = 4)
    val (sigs, bands) = DedupStore.open(spark, root, buckets = 4)
    val increment = docs((500 until 540).map(i => (i.toLong, text(i))) ++
      Seq(900L -> text(2)))

    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      val out = DedupStore.dedupIncrement(increment, sigs, bands)
      assert(out.filter(col("verdict") === "drop_exact").count() == 1)
      val p = out.queryExecution.explainString(FormattedMode)
      assert(p.split("Bucketed: true").length - 1 == 2, p)
      val exchanges = p.split("\n\n").filter(_.contains(") Exchange"))
      assert(exchanges.nonEmpty, p)
      assert(exchanges.forall(e =>
        !e.contains("store_sig") && !e.contains("s_m") &&
          !e.contains("store_id")), p)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      spark.catalog.listTables().collect().map(_.name)
        .filter(_.startsWith("graft_dedupstore_"))
        .foreach(n => spark.sql(s"DROP TABLE `$n`"))
    }
  }

  test("exactSubstrIncrement: spans in the frozen store are cut from " +
    "increment text (store keeps its copy), increment-internal " +
    "cross-doc spans cut everywhere, fresh text untouched; the store " +
    "span probe reads in place") {
    val root = Files.createTempDirectory("dedup-store-spans").toString
    DedupStore.install(docs((0 until 40).map(i => (i.toLong, text(i)))),
      root, buckets = 4)
    // fresh catalog = fresh JVM; spans open independently of sigs/bands
    spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith("graft_dedupstore_"))
      .foreach(n => spark.sql(s"DROP TABLE `$n`"))
    val spans = DedupStore.openSpans(spark, root, buckets = 4)

    def uniq(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val shared = uniq("shinc", 20) // 20-token run shared by 601 and 602
    val increment = docs(Seq(
      // embeds store doc 3's full 30-word text -> those 30 tokens cut
      600L -> s"${uniq("pre", 20)} ${text(3)} ${uniq("post", 20)}",
      601L -> s"${uniq("qa", 20)} $shared ${uniq("qb", 20)}",
      602L -> s"${uniq("qc", 20)} $shared ${uniq("qd", 20)}",
      603L -> uniq("fresh", 60)))

    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      val out = DedupStore.exactSubstrIncrement(increment, spans)
      val got = out.collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("clean_text"), r.getAs[Long]("n_removed"))).toMap
      assert(got(600L) == (s"${uniq("pre", 20)} ${uniq("post", 20)}", 30L),
        got(600L))
      assert(got(601L) == (s"${uniq("qa", 20)} ${uniq("qb", 20)}", 20L),
        got(601L))
      assert(got(602L) == (s"${uniq("qc", 20)} ${uniq("qd", 20)}", 20L),
        got(602L))
      assert(got(603L) == (uniq("fresh", 60), 0L), got(603L))
      // the frozen span set never moves: the spans scan is bucketed
      // and no Exchange carries the store's `h` scan output (every
      // Exchange input is increment-derived)
      val p = out.queryExecution.explainString(FormattedMode)
      assert(p.contains("Bucketed: true"), p)
      val exchanges = p.split("\n\n").filter(_.contains(") Exchange"))
      assert(exchanges.nonEmpty, p)
      assert(!p.contains("Bucketed: false"), p)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      spark.catalog.listTables().collect().map(_.name)
        .filter(_.startsWith("graft_dedupstore_"))
        .foreach(n => spark.sql(s"DROP TABLE `$n`"))
    }
  }

  test("sigbloom prefilter: verdicts byte-identical with and without " +
    "the filter; the filter prunes the exact probe to hits + fpp " +
    "mass; pre-bloom stores open as None") {
    val root = Files.createTempDirectory("dedup-store-bloom").toString
    DedupStore.install(docs((0 until 40).map(i => (i.toLong, text(i)))),
      root, buckets = 4)
    val (sigs, bands) = DedupStore.open(spark, root, buckets = 4)
    val bf = DedupStore.openSigBloom(spark, root)
    assert(bf.nonEmpty)

    val increment = docs((700 until 730).map(i => (i.toLong, text(i))) ++
      Seq(800L -> text(3), 801L -> text(7)))
    def verdicts(bloom: Option[org.apache.spark.sql.DataFrame]) =
      DedupStore.dedupIncrement(increment, sigs, bands, bloom)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3))).sortBy(_._1).toSeq
    assert(verdicts(None) == verdicts(bf))
    assert(verdicts(bf).count(_._4 == "drop_exact") == 2)

    // map-side pruning: of 32 increment sigs only the 2 true hits
    // (plus at most a few fpp collisions) survive the filter
    val maybes = DedupStore.signatures(increment).select(col("sig"))
      .crossJoin(org.apache.spark.sql.functions.broadcast(bf.get))
      .filter(graft.functions.Bloom.mightContain(col("bloom"),
        graft.functions.Hashing.fast64(col("sig"))))
      .count()
    assert(maybes >= 2 && maybes <= 6, maybes)

    // a store installed before the sidecar existed degrades to None
    val empty = Files.createTempDirectory("dedup-store-nobloom").toString
    assert(DedupStore.openSigBloom(spark, empty).isEmpty)

    spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith("graft_dedupstore_"))
      .foreach(n => spark.sql(s"DROP TABLE `$n`"))
  }

  test("the bloom saving is MEASURED: on a 50k-row mostly-fresh " +
    "increment the filtered exact-probe shuffles a small fraction " +
    "of the plain probe's bytes, with identical hits") {
    val sp = spark
    import sp.implicits._
    val root = Files.createTempDirectory("dedup-store-meter").toString
    DedupStore.install(docs((0 until 2000).map(i => (i.toLong, text(i)))),
      root, buckets = 4)
    val (sigs, _) = DedupStore.open(spark, root, buckets = 4)
    val bloom = DedupStore.openSigBloom(spark, root)
    assert(bloom.nonEmpty)

    // synthetic (doc_id, sig) probe frame: 50k fresh signatures + 20
    // true hits (real store sigs), skipping the shingle pass — this
    // test measures the PROBE, not the fingerprinting
    def sigOf(s: String) =
      graft.functions.Hashing.md5HexOf(s.getBytes("UTF-8"))
    val sigged = ((0 until 50000).map(i =>
        (100000L + i, sigOf(s"fresh$i"))) ++
      (0 until 20).map(i => (200000L + i, sigOf(text(i * 7 % 2000)))))
      .toDF("doc_id", "sig") // local scan, NO pre-shuffle: the meter
      // must see only the probe's own exchange, identically in both runs

    val meter = new graft.ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      def measure(bf: Option[org.apache.spark.sql.DataFrame]) = {
        meter.reset()
        val hits = DedupStore.exactProbe(sigged, sigs, bf)
          .collect().map(_.getLong(0)).sorted.toSeq
        org.apache.spark.graftbridge.ListenerBridge
          .drain(spark.sparkContext)
        (hits, meter.mb)
      }
      val (plainHits, plainMb) = measure(None)
      val (bloomHits, bloomMb) = measure(bloom)
      assert(plainHits == bloomHits) // zero false negatives, measured
      assert(plainHits.size == 20)
      // the probe side is the only shuffle: 50 020 rows plain vs
      // 20 + ~1% fpp mass filtered — well under a fifth of the bytes
      assert(bloomMb < plainMb * 0.2, s"bloom $bloomMb vs plain $plainMb")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      spark.sparkContext.removeSparkListener(meter)
      spark.catalog.listTables().collect().map(_.name)
        .filter(_.startsWith("graft_dedupstore_"))
        .foreach(n => spark.sql(s"DROP TABLE `$n`"))
    }
  }
}
