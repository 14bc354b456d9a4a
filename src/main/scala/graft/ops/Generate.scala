package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.crawl.FetchSchedule
import graft.functions.{Hashing, Urls}
import graft.schemas.{CrawlDatum, CrawlRow, GenerateEntry}

/** T1/F4/J9 — the Generator: select the topN due URLs, capped per host,
  * into a new segment's fetchlist (Generator.java:178-643).
  *
  * Declarative plan, all windows partitioned (nothing funnels through a
  * single task):
  *   1. eligibility — schedule.shouldFetch as a column predicate, plus
  *      the `_ngt_` generate-marker gate (a URL generated less than
  *      genDelay ago is in flight and skipped, Generator.java:288-296);
  *   2. optional HostDb broadcast join (Generator.java:369-392) — JEXL
  *      expressions over the host's census compute a per-host maxCount
  *      override and a per-host fetch delay stamped into datum metadata
  *      as `_variableFetchDelay_` (use at Generator.java:506-545);
  *   3. per-host cap — row_number over (host);
  *   4. topN — single segment: distributed take-ordered; multi-segment
  *      spill: the reference's per-reducer quota shape
  *      (Generator.java:440-441,546-553 — each of `numSelectors`
  *      host-hash buckets fills topN/numSelectors rows per segment),
  *      which keeps the rank window partitioned by bucket instead of
  *      moving the whole fetchlist through one task.
  */
object Generate {

  final case class Config(
      topN: Long = Long.MaxValue, // generate.topN
      maxPerHost: Int = Int.MaxValue, // generate.max.count
      curTime: Long = 0L,
      segnum: Int = 1,
      maxNumSegments: Int = 1, // generate.max.num.segments
      numSelectors: Int = 32, // ≙ number of reduce tasks (quota buckets)
      genDelayMs: Long = 7L * 24 * 3600 * 1000, // generate.update.crawldb delay
      maxCountExpr: Option[String] = None, // generate.max.count.expr (JEXL)
      fetchDelayExpr: Option[String] = None) // generate.fetch.delay.expr (JEXL)

  /** Metadata key for the per-host variable fetch delay
    * (Generator.java:491-492). */
  val VariableFetchDelayKey = "_variableFetchDelay_"

  /** shouldFetch as a codegen predicate (AbstractFetchSchedule
    * .java:190-203): due now, or fetchTime so remote it gets pulled in. */
  def dueCol(fetchTime: Column, curTime: Long, maxIntervalSec: Long): Column =
    fetchTime <= curTime || fetchTime - curTime > maxIntervalSec * 1000L

  /** `_ngt_` gate: a URL whose generate-time marker is younger than
    * genDelay is awaiting fetch+updatedb — don't re-generate it
    * (Generator.java:288-296). */
  def notInFlightCol(metadata: Column, curTime: Long, genDelayMs: Long): Column = {
    val ngt = element_at(metadata, CrawlDatum.GenerateTimeKey).cast("long")
    ngt.isNull || ngt + genDelayMs <= curTime
  }

  def apply(db: Dataset[CrawlRow], cfg: Config, schedule: FetchSchedule,
      hostDb: Option[Dataset[UpdateHostDb.HostRow]] = None): Dataset[GenerateEntry] = {
    val spark: SparkSession = db.sparkSession
    import spark.implicits._
    val due0 = db.toDF()
      .filter(dueCol(col("datum.fetchTime"), cfg.curTime,
        schedule.cfg.maxInterval.toLong)
        && notInFlightCol(col("datum.metadata"), cfg.curTime, cfg.genDelayMs))
      .withColumn("host", Urls.host(col("url")))
      .withColumn("sort_score", col("datum.score"))

    // J9: per-host overrides from the HostDb census (broadcast — the
    // hostdb is tiny relative to the crawldb: one row per host)
    val due = hostDb match {
      case Some(h) => due0.join(broadcast(h.toDF()), Seq("host"), "left")
      case None => due0
    }
    val maxCnt: Column = cfg.maxCountExpr.filter(_ => hostDb.isDefined) match {
      case Some(e) =>
        // Math.round(expr) per host; default cap when the host has no
        // hostdb row or the expression nulls out (Generator.java:506-519)
        coalesce(round(expr(graft.net.Jexl.toSqlExpr(e)), 0).cast("int"),
          lit(cfg.maxPerHost))
      case None => lit(cfg.maxPerHost)
    }
    val datumCol: Column = cfg.fetchDelayExpr.filter(_ => hostDb.isDefined) match {
      case Some(e) =>
        val delay = round(expr(graft.net.Jexl.toSqlExpr(e)), 0).cast("long")
        when(delay.isNotNull && delay > 0,
          col("datum").withField("metadata",
            map_concat(
              map_filter(coalesce(col("datum.metadata"),
                map().cast("map<string,string>")),
                (k, _) => k =!= VariableFetchDelayKey),
              map(lit(VariableFetchDelayKey), delay.cast("string")))))
          .otherwise(col("datum"))
      case None => col("datum")
    }

    // Host-cap strategies, by cap kind (the host key is the engine's
    // known skew axis — one host can own a third of a crawl):
    //  - no cap → no per-host pass at all;
    //  - static cap → skew-immune bounded top-k (O(k) partial agg +
    //    semi-join on url; see Relational.boundedTopKPerKey — a hot
    //    host never concentrates its full group in one task);
    //  - dynamic JEXL cap → rank window (the cap is data-dependent, so
    //    the buffer can't be pre-sized; the hostdb side is broadcast
    //    and per-host ranks are what the semantics demand).
    val withDatum = due.select(col("url"), datumCol.as("datum"),
      col("host"), col("sort_score"))
    val capped =
      if (cfg.maxCountExpr.isDefined) {
        val perHost = Window.partitionBy(col("host"))
          .orderBy(desc("sort_score"), asc("url"))
        due
          .withColumn("host_rank", row_number().over(perHost))
          .filter(maxCnt <= 0 || col("host_rank") <= maxCnt)
          .select(col("url"), datumCol.as("datum"), col("host"),
            col("sort_score"))
      } else if (cfg.maxPerHost <= 0 || cfg.maxPerHost == Int.MaxValue) {
        withDatum // uncapped: the window would be pure overhead
      } else {
        graft.operators.Relational.boundedTopKPerKey(
          withDatum, Seq("host"),
          // NaN flag first: a desc window ranks NaN scores highest,
          // and -NaN = NaN would invert that under ascending struct-min
          struct(when(isnan(col("sort_score")), lit(0)).otherwise(lit(1))
              .as("s0"),
            (-col("sort_score")).as("s"), col("url").as("id")),
          "url", cfg.maxPerHost)
      }

    val out: DataFrame =
      if (cfg.maxNumSegments <= 1) {
        // global topN via distributed take-ordered (partial top-k per
        // partition, bounded merge); unbounded topN ⇒ no sort at all
        if (cfg.topN == Long.MaxValue) capped.withColumn("seg", lit(cfg.segnum))
        else capped.orderBy(desc("sort_score"), asc("url"))
          .limit(math.min(cfg.topN, Int.MaxValue.toLong).toInt)
          .withColumn("seg", lit(cfg.segnum))
      } else {
        // multi-segment spill: per-selector quota (Generator.java:
        // 440-441: limit = topN / numReduceTasks; 546-553: every `limit`
        // rows advance the segment). Requires a finite topN — the quota
        // is what bounds each window partition.
        require(cfg.topN != Long.MaxValue,
          "maxNumSegments > 1 requires a finite topN")
        val nSel = math.max(1, cfg.numSelectors)
        val localLimit = math.max(1L, cfg.topN / nSel)
        val bucket = pmod(Hashing.md5Long(col("host")), lit(nSel))
        val perBucket = Window.partitionBy(bucket)
          .orderBy(desc("sort_score"), asc("url"))
        capped
          .withColumn("bucket_rank", row_number().over(perBucket))
          .filter(col("bucket_rank") <= localLimit * cfg.maxNumSegments)
          .withColumn("seg",
            (floor((col("bucket_rank") - 1) / localLimit) + cfg.segnum)
              .cast("int"))
      }
    out.select(
      col("seg").cast("int").as("segnum"),
      col("sort_score").as("sortScore"),
      col("url"),
      col("datum")).as[GenerateEntry]
  }

  /** generate.update.crawldb (Generator.java:707-757 CrawlDbUpdater):
    * stamp `_ngt_` = genTime into the db copy for every URL selected
    * into the fetchlist, so overlapping generates skip in-flight URLs.
    * UpdateDb strips the marker when the fetch comes back. */
  def markGenerated(db: Dataset[CrawlRow], fetchlist: Dataset[GenerateEntry],
      genTime: Long): Dataset[CrawlRow] = {
    val spark = db.sparkSession
    import spark.implicits._
    val selected = fetchlist.toDF().select(col("url"))
      .distinct().withColumn("_gen", lit(true))
    db.toDF().join(selected, Seq("url"), "left")
      .select(col("url"),
        when(col("_gen"),
          col("datum").withField("metadata",
            map_concat(
              map_filter(coalesce(col("datum.metadata"),
                map().cast("map<string,string>")),
                (k, _) => k =!= CrawlDatum.GenerateTimeKey),
              map(lit(CrawlDatum.GenerateTimeKey), lit(genTime.toString)))))
          .otherwise(col("datum")).as("datum"))
      .as[CrawlRow]
  }
}
