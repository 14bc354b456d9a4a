package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import Queries.{t, fx, fxSum, sqlFxSum}

/** Batch 1 — relational core (SURVEY §2.3/§2.5/§2.6/§2.7 shapes). */
object QueriesCore {

  // =========================================================================
  // Batch 1 — relational core (SURVEY §2.3/§2.5/§2.6/§2.7 shapes)
  // =========================================================================

  /** A1/TPC-H-Q1-style pricing summary — the headline scan+agg.
    * Reference shape: CrawlDbReader stats (CrawlDbReader.java:371-509). */
  val q1Pricing = Q(
    "q1_pricing_summary",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      li.filter(to_date(col("l_shipdate")) <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          fxSum(col("l_quantity"), 2).as("sum_qty"),
          fxSum(col("l_extendedprice"), 2).as("sum_base_price"),
          fxSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 2)
            .as("sum_disc_price"),
          fxSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax")), 2).as("sum_charge"),
          count(lit(1)).as("count_order"))
    },
    Some(s"""
      SELECT l_returnflag, l_linestatus,
        ${sqlFxSum("l_quantity", 2)} AS sum_qty,
        ${sqlFxSum("l_extendedprice", 2)} AS sum_base_price,
        ${sqlFxSum("l_extendedprice*(1.0-l_discount)", 2)} AS sum_disc_price,
        ${sqlFxSum("l_extendedprice*(1.0-l_discount)*(1.0+l_tax)", 2)} AS sum_charge,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
      GROUP BY l_returnflag, l_linestatus"""))

  /** T2 topN dump analog: top customers by revenue (score-desc top-k with
    * total tiebreak; CrawlDbReader.java:956-1020). */
  val q2TopCustomers = Q(
    "q2_top_customers",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(fxSum(col("o_totalprice"), 2).as("revenue"),
             count(lit(1)).as("n_orders"))
        .orderBy(desc("revenue"), asc("c_custkey"))
        .limit(10)
    },
    Some("""
      SELECT c_custkey, c_name, n_name,
        CAST(SUM(CAST(ROUND(o_totalprice*1e2) AS BIGINT)) AS DOUBLE)/1e2 AS revenue,
        COUNT(*) AS n_orders
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY c_custkey, c_name, n_name
      ORDER BY revenue DESC, c_custkey LIMIT 10"""))

  /** A3 domain-statistics analog over the dim hierarchy (broadcast dims;
    * DomainStatistics.java:49-253). */
  val q3RegionRollup = Q(
    "q3_region_rollup",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          countDistinct(col("o_orderkey")).as("n_orders"),
          count(lit(1)).as("n_items"),
          fxSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 2)
            .as("revenue"))
    },
    Some(s"""
      SELECT r_name,
        COUNT(DISTINCT o_orderkey) AS n_orders,
        COUNT(*) AS n_items,
        ${sqlFxSum("l_extendedprice*(1.0-l_discount)", 2)} AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name"""))

  /** J1 Inject merge: full-outer merge of seeds with existing crawldb —
    * default flags: existing row wins, new-only becomes unfetched
    * (Injector.java:299-395, rules at 336-349). */
  val injectMerge = Q(
    "inject_merge",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val seeds = o.filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey").as("url"), lit(1.0).as("seed_score"))
      val db = o.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey").as("url"), col("o_totalprice").as("db_score"))
      seeds.join(db, Seq("url"), "full_outer")
        .select(
          col("url"),
          when(col("db_score").isNotNull, lit("existing"))
            .otherwise(lit("injected_unfetched")).as("status"),
          coalesce(col("db_score"), col("seed_score")).as("score"))
    },
    Some("""
      WITH seeds AS (
        SELECT o_orderkey AS url, CAST(1.0 AS DOUBLE) AS seed_score
        FROM orders WHERE o_orderkey % 3 = 0),
      db AS (
        SELECT o_orderkey AS url, o_totalprice AS db_score
        FROM orders WHERE o_orderkey % 2 = 0)
      SELECT COALESCE(s.url, d.url) AS url,
        CASE WHEN d.db_score IS NOT NULL THEN 'existing'
             ELSE 'injected_unfetched' END AS status,
        COALESCE(d.db_score, s.seed_score) AS score
      FROM seeds s FULL OUTER JOIN db d ON s.url = d.url"""))

  /** J2/U1 latest-wins merge: per key keep the newest record
    * (CrawlDbReducer latest-by-fetchTime; CrawlDbMerger.java:81-110). */
  val updatedbLatest = Q(
    "updatedb_latest_wins",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(desc("ts"), desc("event_id"))
      val wc = Window.partitionBy(col("user_id"), col("event_type"))
      ev.withColumn("rn", row_number().over(w))
        .withColumn("n_events", count(lit(1)).over(wc))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"),
          col("event_id").as("last_event_id"),
          col("value").as("last_value"),
          col("n_events"))
    },
    Some("""
      SELECT user_id, event_type, event_id AS last_event_id,
             value AS last_value, n_events
      FROM (SELECT *,
              row_number() OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts DESC, event_id DESC) AS rn,
              CAST(count(*) OVER (PARTITION BY user_id, event_type) AS BIGINT)
                AS n_events
            FROM events)
      WHERE rn = 1"""))

  /** T1 Generator: per-host cap (generate.max.count) then global topN by
    * score desc (Generator.java:178-643). Host = customer nation. */
  val generateTopn = Q(
    "generate_topn",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val fetchlist = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .select(col("o_orderkey").as("url"), col("c_nationkey").as("host"),
          col("o_totalprice").as("score"))
      val perHost = Window.partitionBy(col("host"))
        .orderBy(desc("score"), asc("url"))
      fetchlist.withColumn("host_rank", row_number().over(perHost))
        .filter(col("host_rank") <= 20)
        .orderBy(desc("score"), asc("url"))
        .limit(100)
        .select(col("url"), col("host"), col("score"))
    },
    Some("""
      SELECT url, host, score FROM (
        SELECT o_orderkey AS url, c_nationkey AS host, o_totalprice AS score,
               row_number() OVER (PARTITION BY c_nationkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS host_rank
        FROM orders JOIN customer ON o_custkey = c_custkey)
      WHERE host_rank <= 20
      ORDER BY score DESC, url LIMIT 100"""))

  /** T1 under skew: the same per-host cap semantics as generate_topn's
    * rank window, but through the skew-immune shape Generate uses for
    * static caps ([[graft.operators.Relational.boundedTopKPerKey]]:
    * O(k) bounded aggregate with map-side combine + semi-join on the
    * unique url — a hot host never concentrates its group in one task,
    * which the rank window forces at any scale). Oracle-verified equal
    * to the window phrasing. */
  val hostCapSkewsafe = Q(
    "host_cap_skewsafe",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val fetchlist = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .select(col("o_orderkey").as("url"), col("c_nationkey").as("host"),
          col("o_totalprice").as("score"))
      graft.operators.Relational.boundedTopKPerKey(
        fetchlist, Seq("host"),
        struct((-col("score")).as("s"), col("url").as("id")), "url", 20)
        .select("url", "host", "score")
    },
    Some("""
      SELECT url, host, score FROM (
        SELECT o_orderkey AS url, c_nationkey AS host, o_totalprice AS score,
               row_number() OVER (PARTITION BY c_nationkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders JOIN customer ON o_custkey = c_custkey)
      WHERE rn <= 20"""))

  /** A1 CrawlDb stats: counts, min/max/sum score, exact quantiles per
    * status (CrawlDbReader.java:371-509). All aggregates derive from the
    * per-status sorted value histogram (Relational.valueHistogram →
    * hist*): exact quantile_cont semantics with NO per-status rank
    * window — the phase-1 shuffle keys on (status, value), so a status
    * that dominates the crawldb still spreads across the cluster. */
  val crawldbStats = Q(
    "crawldb_stats",
    (s, dir) => {
      import graft.operators.Relational._
      val o = t(s, dir, "orders")
      val h = valueHistogram(
        o.select(col("o_orderstatus").as("status"), col("o_totalprice")),
        Seq("status"), col("o_totalprice"))
      def qc(q: Double) = round(histQuantileCont(col("hist"), q), 4)
      h.select(
        col("status"),
        histN(col("hist")).as("cnt"),
        histMin(col("hist")).as("min_score"),
        histMax(col("hist")).as("max_score"),
        histFxSum(col("hist"), 2).as("sum_score"),
        qc(0.25).as("p25"),
        qc(0.5).as("p50"),
        qc(0.75).as("p75"))
    },
    Some(s"""
      SELECT o_orderstatus AS status,
        COUNT(*) AS cnt,
        MIN(o_totalprice) AS min_score,
        MAX(o_totalprice) AS max_score,
        ${sqlFxSum("o_totalprice", 2)} AS sum_score,
        ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
        ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75
      FROM orders GROUP BY o_orderstatus"""))

  /** T4 Dedup ordering: within a signature group rank by the compareOrder
    * criteria chain and mark all but the best DUPLICATE
    * (DeduplicationJob.java:161-247). Signature = l_orderkey group.
    * Keeper election is min(struct(compare chain)) per signature —
    * map-side combinable, then an AQE-splittable join back (the
    * Dedup.findDuplicates shape) — not a sig-partitioned window, which
    * a hot signature would turn into one straggler task. The desc
    * score leg rides as its negation inside the struct (exact for
    * these non-NaN money values; Dedup.scala handles the NaN-bearing
    * crawl case with an explicit NaN rank leg). The oracle elects via
    * rank() — not row_number — so both sides state the same
    * tie-deterministic semantic: every row tying on the FULL compare
    * chain is a keeper. (Here ties cannot occur — member =
    * l_linenumber is unique within an orderkey — but the semantic no
    * longer depends on that invariant.) */
  val dedupRank = Q(
    "dedup_rank",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val m = li.select(
        col("l_orderkey").as("sig"),
        col("l_linenumber").as("member"),
        col("l_extendedprice").as("score"),
        col("l_shipdate"))
      val best = m.groupBy("sig").agg(
        min(struct((-col("score")).as("ns"), col("l_shipdate").as("sd"),
          col("member").as("m"))).as("b"))
      // keeper test compares the FULL compare chain, not just member:
      // (sig, member) is not unique in this data, so a member-only
      // test would crown every row sharing the winner's member
      m.join(best, "sig")
        .select(
          col("sig"), col("member"), col("score"),
          when(struct((-col("score")).as("ns"),
              col("l_shipdate").as("sd"), col("member").as("m")) ===
              col("b"), lit("keep"))
            .otherwise(lit("duplicate")).as("dedup_status"))
    },
    Some("""
      SELECT l_orderkey AS sig, l_linenumber AS member,
             l_extendedprice AS score,
             CASE WHEN rnk = 1 THEN 'keep' ELSE 'duplicate' END AS dedup_status
      FROM (SELECT *,
              rank() OVER (PARTITION BY l_orderkey
                ORDER BY l_extendedprice DESC, l_shipdate, l_linenumber) AS rnk
            FROM lineitem)"""))

  /** A3/A4 domain statistics: url counts + fetched counts grouped by the
    * PSL-aware registrable domain (DomainStatistics.java:185-231 `domain`
    * mode via URLUtil.getDomainName, CrawlCompletionStats.java:190-250).
    * URLs are synthesized across suffix classes — incl. multi-label and
    * wildcard public suffixes — so a wrong grouping (the round-2
    * two-label fallback) would merge or split domains and break the
    * counts; the oracle states the per-class PSL answer. */
  val domainStats = Q(
    "domain_stats",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val sfx = element_at(
        array(lit(".com"), lit(".co.uk"), lit(".plc.co.im"),
          lit(".2000.hu"), lit(".ck"), lit(".nn")),
        (col("c_custkey") % 6 + 1).cast("int"))
      val url = concat(lit("https://www.site"), col("c_custkey") % 40,
        sfx, lit("/p/"), col("o_orderkey"))
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .select(url.as("url"), col("o_orderstatus"))
        .groupBy(graft.functions.Urls.registeredDomain(col("url"))
          .as("domain"))
        .agg(
          count(lit(1)).as("n_urls"),
          count(when(col("o_orderstatus") === "F", lit(1))).as("n_fetched"),
          count(when(col("o_orderstatus") === "O", lit(1))).as("n_unfetched"))
    },
    Some("""
      WITH u AS (
        SELECT 'https://www.site' || (c_custkey % 40)
            || (['.com', '.co.uk', '.plc.co.im',
                 '.2000.hu', '.ck', '.nn'][(c_custkey % 6 + 1)::INT])
            || '/p/' || o_orderkey AS url,
          c_custkey % 6 AS cls, o_orderstatus,
          'site' || (c_custkey % 40) AS label
        FROM orders JOIN customer ON o_custkey = c_custkey)
      SELECT
        CASE CAST(cls AS INTEGER)
          WHEN 0 THEN label || '.com'
          WHEN 1 THEN label || '.co.uk'
          WHEN 2 THEN label || '.plc.co.im'
          WHEN 3 THEN label || '.2000.hu'
          WHEN 4 THEN 'www.' || label || '.ck'  -- *.ck: whole host
          ELSE 'www.' || label || '.nn' END AS domain, -- no suffix: host
        COUNT(*) AS n_urls,
        COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_fetched,
        COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_unfetched
      FROM u GROUP BY 1"""))

  /** A5 protocol-status stats: counts by code with a deterministic sample
    * url (ProtocolStatusStatistics.java:138-170; first → min for
    * determinism). */
  val protocolStatusStats = Q(
    "protocol_status_stats",
    (s, dir) => {
      val ev = t(s, dir, "events")
      ev.groupBy(col("event_type").as("code"))
        .agg(
          count(lit(1)).as("cnt"),
          min(col("event_id")).as("sample_id"),
          fxSum(col("value"), 2).as("sum_value"))
    },
    Some(s"""
      SELECT event_type AS code, COUNT(*) AS cnt,
        MIN(event_id) AS sample_id,
        ${sqlFxSum("value", 2)} AS sum_value
      FROM events GROUP BY event_type"""))

  /** G5 orphan detection: rows with no inbound reference — anti-join
    * (scoring-orphan plugin; CrawlDbReducer.java:178-185). */
  val orphanDetect = Q(
    "orphan_detect",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      o.join(li, o("o_orderkey") === li("l_orderkey"), "left_anti")
        .select(col("o_orderkey").as("url"), col("o_orderstatus").as("status"))
    },
    Some("""
      SELECT o_orderkey AS url, o_orderstatus AS status
      FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                        WHERE l.l_orderkey = o.o_orderkey)"""))

  /** Range (interval) join via grid-cell equi-join — the operator the
    * reference has no analog for (SURVEY §2.3 "no theta/range/as-of
    * joins") and Spark itself plans as BroadcastNestedLoop/Cartesian:
    * probe values against variable-width [lo, hi) bands. The scalable
    * shape quantizes the value axis into fixed G-cells, EXPANDS each
    * band to the ≤ ceil(maxWidth/G)+1 cells it overlaps (explode —
    * here ≤ 2 rows per band by construction), equi-joins on the cell
    * key, and re-checks the exact interval predicate after. Cost: one
    * hash-shuffle join with ≤ 2× build amplification instead of an
    * unprunable |probe|×|bands| loop — the standard spatial-grid
    * decomposition, 1-D. All arithmetic is exact 64-bit integer. */
  /** The query's aggregate over [[graft.ops.RangeJoin.join]] (the
    * public operator — its scaladoc holds the grid-hazard analysis)
    * on (band_id, lo, hi) × (o_orderkey, v) frames. */
  private[graft] def rangeJoinOn(bands: org.apache.spark.sql.DataFrame,
      probe: org.apache.spark.sql.DataFrame, G: Long)
      : org.apache.spark.sql.DataFrame =
    graft.ops.RangeJoin.join(bands, probe, "lo", "hi", "v", Some(G))
      .groupBy("band_id")
      .agg(count(lit(1)).as("n_orders"), min(col("o_orderkey")).as("min_o"),
        sum(col("v")).as("sum_v"))

  /** Grid derivation — see [[graft.ops.RangeJoin.grid]] (r12 verdict
    * Next #5: G was a caller obligation, and the probe showed the
    * misfit failure mode is silent-in-shuffle). */
  private[graft] def rangeJoinGrid(bands: org.apache.spark.sql.DataFrame)
      : Long = graft.ops.RangeJoin.grid(bands, "lo", "hi")

  /** [[rangeJoinOn]] with the grid derived from the data — the
    * no-tuning-knob entry point. */
  private[graft] def rangeJoinAuto(bands: org.apache.spark.sql.DataFrame,
      probe: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    rangeJoinOn(bands, probe, rangeJoinGrid(bands))

  val rangeJoin = Q(
    "range_join",
    (s, dir) => {
      val bands = t(s, dir, "part").select(
        col("p_partkey").as("band_id"),
        ((col("p_partkey") * 9973) % 100000).as("lo"),
        ((col("p_partkey") * 9973) % 100000 + 100 +
          (col("p_partkey") % 13) * 300).as("hi"))
      val probe = t(s, dir, "orders").select(
        col("o_orderkey"), (col("o_orderkey") % 100000).as("v"))
      // grid auto-derived from the width distribution (widths are
      // 100 + 300k, k in 0..12 → p99 = 3700, the max) — same answer
      // as any valid fixed G, asserted by the oracle and the
      // RangeJoinAuto spec
      rangeJoinAuto(bands, probe)
    },
    Some("""
      SELECT p_partkey AS band_id,
        COUNT(*) AS n_orders,
        MIN(o_orderkey) AS min_o,
        CAST(SUM(o_orderkey % 100000) AS BIGINT) AS sum_v
      FROM part JOIN orders
        ON o_orderkey % 100000 >= (p_partkey * 9973) % 100000
       AND o_orderkey % 100000 < (p_partkey * 9973) % 100000 + 100
                                  + (p_partkey % 13) * 300
      GROUP BY 1"""))

  /** [[rangeJoin]] invoked through the SQL table-function surface
    * (r13 verdict Next #6): `range_join('bands', 'probe', 'lo', 'hi',
    * 'v')` in a FROM clause plans [[graft.ops.RangeJoin]]'s grid-cell
    * equi-join (self-derived G, exact re-check) instead of the
    * BroadcastNestedLoop Spark gives the raw theta-join phrasing.
    * Registered by GraftExtensions in product sessions; registered
    * imperatively here so the query is green with and without
    * extensions. Same oracle as `range_join`. */
  val rangeJoinSql = Q(
    "range_join_sql",
    (s, dir) => {
      graft.plans.GraftExtensions.ensureTableFunctions(s)
      t(s, dir, "part").select(
          col("p_partkey").as("band_id"),
          ((col("p_partkey") * 9973) % 100000).as("lo"),
          ((col("p_partkey") * 9973) % 100000 + 100 +
            (col("p_partkey") % 13) * 300).as("hi"))
        .createOrReplaceTempView("graft_sql_range_bands")
      t(s, dir, "orders").select(
          col("o_orderkey"), (col("o_orderkey") % 100000).as("v"))
        .createOrReplaceTempView("graft_sql_range_probe")
      s.sql("""
        SELECT band_id, COUNT(*) AS n_orders, MIN(o_orderkey) AS min_o,
               SUM(v) AS sum_v
        FROM range_join('graft_sql_range_bands', 'graft_sql_range_probe',
                        'lo', 'hi', 'v')
        GROUP BY band_id""")
    },
    Some("""
      SELECT p_partkey AS band_id,
        COUNT(*) AS n_orders,
        MIN(o_orderkey) AS min_o,
        CAST(SUM(o_orderkey % 100000) AS BIGINT) AS sum_v
      FROM part JOIN orders
        ON o_orderkey % 100000 >= (p_partkey * 9973) % 100000
       AND o_orderkey % 100000 < (p_partkey * 9973) % 100000 + 100
                                  + (p_partkey % 13) * 300
      GROUP BY 1"""))

  val all: Seq[Q] = Seq(
    q1Pricing, q2TopCustomers, q3RegionRollup, injectMerge, updatedbLatest,
    generateTopn, hostCapSkewsafe, crawldbStats, dedupRank, domainStats,
    protocolStatusStats, orphanDetect, rangeJoin, rangeJoinSql)
}
