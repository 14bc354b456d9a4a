package graft.ops

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.crawl.{DefaultFetchSchedule, ScheduleConfig, UpdateDb}
import graft.schemas.{CrawlDatum, CrawlRow, CrawlStatus => S}

/** Planted-skew proof for the host-keyed paths (SURVEY §4's known
  * pathology: one host dominating a partition). The fixture gives ONE
  * host ~30% of all rows; each test asserts the corresponding operator
  * completes with balanced tasks — because its shuffle keys on url /
  * (src,dst) (hash-spread), because partial aggregation bounds a hot
  * key's volume, or because the static host-cap path avoids the
  * unsplittable per-host window entirely — plus one test demonstrating
  * AQE skew-join engaging on the host-keyed join shape that remains. */
class SkewSpec extends AnyFunSuite with SparkSuite {

  private val t0 = 1700000000000L
  private val sched = DefaultFetchSchedule(ScheduleConfig())

  /** n urls: 30% on hot.example.com, the rest spread over 700 hosts. */
  private def urls(n: Int): Seq[(String, Int)] = (0 until n).map { i =>
    val host =
      if (i % 10 < 3) "hot.example.com" else s"h${i % 700}.example.com"
    (s"http://$host/page$i", i)
  }

  private def skewedDb(n: Int): Seq[CrawlRow] = urls(n).map { case (u, i) =>
    CrawlRow(u, CrawlDatum.unfetched(t0, 3600, score = (i % 100) / 10.0f))
  }

  /** Per-task shuffle-read record counts, grouped by stage. */
  private final class BalanceListener extends SparkListener {
    val byStage = new java.util.concurrent.ConcurrentHashMap[Int,
      java.util.concurrent.ConcurrentLinkedQueue[Long]]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskMetrics != null) {
        byStage.computeIfAbsent(t.stageId,
          _ => new java.util.concurrent.ConcurrentLinkedQueue[Long]())
          .add(t.taskMetrics.shuffleReadMetrics.recordsRead)
      }
    /** max/mean task read-records of the heaviest shuffle-read stage. */
    def worstImbalance(minRecords: Long): Double = {
      import scala.jdk.CollectionConverters._
      val stages = byStage.asScala.values.map(_.asScala.map(_.toDouble).toSeq)
        .filter(s => s.size > 1 && s.sum >= minRecords)
      if (stages.isEmpty) 0.0
      else stages.map(s => s.max / (s.sum / s.size)).max
    }
  }

  private def withListener[T](body: => T): (T, BalanceListener) = {
    val l = new BalanceListener
    spark.sparkContext.addSparkListener(l)
    try {
      val r = body
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      (r, l)
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("static generate host-cap avoids the per-host window " +
    "and matches the rank semantics under 30% host skew") {
    import spark.implicits._
    // include NaN scores: the rank window puts them first per host and
    // the bounded path must agree
    val db = spark.createDataset(skewedDb(20000).zipWithIndex.map {
      case (r, i) if i % 1501 == 0 =>
        r.copy(datum = r.datum.copy(score = Float.NaN))
      case (r, _) => r
    })
    val out = Generate(db, Generate.Config(curTime = t0 + 1000,
      maxPerHost = 10, segnum = 1), sched)
    // plan: bounded O(k) aggregate + semi-join, NO rank window — a
    // window would put the hot host's 6000 rows in one task at any SF
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("bounded_sorted_list"), plan)
    val rows = out.collect()
    def hostOf(u: String) = u.stripPrefix("http://").takeWhile(_ != '/')
    val perHost = rows.groupBy(r => hostOf(r.url))
    assert(perHost.values.forall(_.length <= 10))
    assert(perHost("hot.example.com").length == 10)
    // exact A/B vs the window phrasing on the same input
    val expected = graft.operators.Relational.topKPerGroup(
      db.toDF().withColumn("host",
        graft.functions.Urls.host(col("url"))),
      Seq("host"), Seq(desc("datum.score"), asc("url")), 10)
      .select("url").as[String].collect().toSet
    assert(rows.map(_.url).toSet == expected)
  }

  test("uncapped generate plans no per-host window at all") {
    import spark.implicits._
    val db = spark.createDataset(skewedDb(2000))
    val out = Generate(db, Generate.Config(curTime = t0 + 1000), sched)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(out.count() == 2000)
  }

  test("updatedb's url-keyed shuffle spreads a 30%-host corpus evenly") {
    import spark.implicits._
    val n = 30000
    val fetched = urls(n).filter(_._2 % 2 == 0).map { case (u, _) =>
      CrawlRow(u, CrawlDatum(S.FETCH_SUCCESS, t0 + 1000, 0, 3600, 1.0f,
        Some("sig"), 0L, Map.empty))
    }
    val updates = spark.createDataset(skewedDb(n) ++ fetched)
    val (cnt, l) = withListener {
      UpdateDb(updates, t0 + 2000, sched).count()
    }
    val imb = l.worstImbalance(n / 2)
    assert(cnt == n.toLong)
    // url-hash spread: no task reads a straggler share. 4 tasks at 4
    // shuffle partitions -> perfectly balanced is 1.0; the hot host
    // would be >= 2.2 (30% + its partition's fair share of the rest)
    assert(imb < 1.8, s"imbalance $imb")
  }

  test("webgraph in-degree partial aggregation bounds a hot dst key") {
    import spark.implicits._
    // 30% of all edges point at ONE url: partial (map-side) combine
    // must collapse each map task's share to one row, so the reduce
    // task owning the hot key reads O(#maps), not O(#edges)
    val edges = (0 until 60000).map { i =>
      val dst = if (i % 10 < 3) "http://hot.example.com/"
        else s"http://h${i % 700}.example.com/p${i % 97}"
      (s"http://src${i % 3000}.example.com/p$i", dst)
    }
    val df = spark.createDataset(edges).toDF("src", "dst")
      .repartition(8) // several map tasks
    val (records, l) = withListener {
      df.groupBy("dst").agg(count(lit(1)).as("in_deg")).count()
    }
    val imb = l.worstImbalance(1000)
    // without partial agg the hot-key task reads ~18600 of ~62k records
    // (max/mean ~= 1.2 only if combined; >= 3 if every edge shipped)
    assert(imb < 2.0, s"imbalance $imb")
    val plan = df.groupBy("dst").agg(count(lit(1)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_count") || plan.contains("Partial"), plan)
  }

  test("dedup keeper selection is window-free and rank-exact under a " +
    "30% hot signature") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // 30% of fetched rows share ONE signature (the every-empty-page
    // case); the rest form small groups of ~3
    val n = 20000
    val rows = (0 until n).map { i =>
      val sig = if (i % 10 < 3) "HOT" else s"sig${i % (n / 3)}"
      // a sprinkle of NaN scores: the desc window ranks NaN FIRST, and
      // the struct-min shape must reproduce that exactly (the naive
      // -score encoding would rank NaN last instead)
      val score = if (i % 997 == 0) Float.NaN else (i % 97) / 10.0f
      CrawlRow(s"http://h${i % 700}.example.com/p$i",
        CrawlDatum(S.DB_FETCHED, t0 + i % 1000, 0, 3600,
          score, Some(sig), 0L, Map.empty))
    }
    val db = spark.createDataset(rows)
    val dups = Dedup.findDuplicates(db)
    val plan = dups.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    val got = dups.collect().map(_.url).toSet
    // A/B: the window phrasing of the same compare chain
    val decodedLen = length(col("url")) -
      lit(2) * size(split(col("url"), "%", -1)) + lit(2)
    val w = Window.partitionBy(col("datum.signature")).orderBy(
      desc("datum.score"), desc("datum.fetchTime"), desc("is_https"),
      asc("decoded_len"), asc("url"))
    val expected = db.toDF()
      .withColumn("is_https", col("url").startsWith("https://").cast("int"))
      .withColumn("decoded_len", decodedLen)
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rn") =!= 1).select("url").as[String].collect().toSet
    assert(got == expected)
    // the hot group kept exactly one survivor
    val hotDups = got.count(u => rows.find(_.url == u)
      .exists(_.datum.signature.contains("HOT")))
    assert(hotDups == rows.count(_.datum.signature.contains("HOT")) - 1)
  }

  test("AQE skew-join engages on a host-keyed sort-merge join") {
    import spark.implicits._
    val confs = Map(
      "spark.sql.shuffle.partitions" -> "20",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "50k",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.keys.map(k =>
      k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // both sides host-keyed; the left carries the 30% host and a
      // payload so the hot partition clears the size threshold
      val left = spark.createDataset(urls(60000)).toDF("url", "i")
        .withColumn("host", graft.functions.Urls.host(col("url")))
        .withColumn("pad", lpad(col("i").cast("string"), 80, "x"))
      val right = spark.createDataset(
        (0 until 701).flatMap(h => (0 until 20).map(j =>
          (if (h == 700) "hot.example.com" else s"h$h.example.com", j))))
        .toDF("host", "j")
      val joined = left.join(right, Seq("host"))
      // execute THIS dataset's own physical plan (count()/foreach()
      // build a separate QueryExecution), so the adaptive plan read
      // below is the executed, finalized one
      assert(joined.queryExecution.executedPlan.execute().count() > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan)
      assert(plan.contains("skew=true"),
        s"AQE skew-join did not engage:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("two-phase prefix sum matches the group window exactly and " +
    "spreads a 90%-hot language across tasks") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // the pack_chunks pathology: one language owns 90% of the corpus,
    // so a lang-partitioned running-sum window puts 90% of rows in ONE
    // task (AQE cannot split a window partition). A few null-lang rows
    // exercise the null-safe offset join (null is a group, as it is
    // for the window).
    val n = 40000
    val rows = (0 until n).map { i =>
      val lang =
        if (i % 1003 == 0) null
        else if (i % 10 < 9) "en"
        else s"l${i % 7}"
      (lang, i.toLong, (i % 97).toLong + 1)
    }
    val df = spark.createDataset(rows).toDF("lang", "doc_id", "nt")
      .repartition(8) // several map tasks feed the range exchange
    val scan = PrefixSum.groupedRunningSum(
      df, col("lang"), col("doc_id"), col("nt"), "cum")
    val (got, l) = withListener {
      scan.select("lang", "doc_id", "cum").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    }
    // exact A/B vs the window phrasing (the oracle semantics)
    val w = Window.partitionBy("lang").orderBy("doc_id")
    val expected = df.withColumn("cum", sum(col("nt")).over(w))
      .select("lang", "doc_id", "cum").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected)
    // balance: the hot language spans the partition count, so no task
    // reads a straggler share. A lang-partitioned window at 4 reduce
    // tasks would put 90% of records in one task (max/mean >= 3.2);
    // both scan shuffles (range + local-window) must stay spread.
    val imb = l.worstImbalance(n / 2)
    assert(imb < 2.0, s"imbalance $imb")
  }
}
