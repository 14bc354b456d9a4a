package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Urls
import graft.schemas.{CrawlRow, CrawlStatus}

/** J8 — UpdateHostDb over the real crawldb
  * (UpdateHostDbJob / UpdateHostDbReducer.java:176-349): per-host
  * status census from the crawldb, FULL-OUTER merged onto the previous
  * hostdb; failure counters carry forward, lastCheck refreshes when the
  * host was seen this round. DNS checking itself is a fetch-side
  * effect; its outcome is the carried counter. */
object UpdateHostDb {

  final case class HostRow(host: String, unfetched: Long, fetched: Long,
      gone: Long, redirTemp: Long, redirPerm: Long, notModified: Long,
      dnsFailures: Long, connectionFailures: Long, score: Double,
      lastCheck: Long)

  /** J8 DNS-check seam (ResolverThread.java:112-178). The reference
    * spawns resolver threads per host inside the reducer; the Spark
    * shape is a map over the merged hostdb with the SAME outcome table:
    *
    *   resolves, new host          → new_known_host, lastCheck refreshed
    *   resolves, had dnsFailures   → rediscovered_host, failures reset
    *   resolves, known             → existing_known_host
    *   fails, new host             → new_unknown_host, dnsFailures = 1
    *   fails, known                → existing_unknown_host, failures+1,
    *                                 kept/purged by the threshold rule
    *                                 (ResolverThread.java:146-155: kept
    *                                 when threshold == -1 or threshold <
    *                                 failures — the reference's literal
    *                                 condition, mirrored as-is)
    */
  trait Resolver extends Serializable {
    /** true when the host resolves (InetAddress.getByName succeeding). */
    def resolve(host: String): Boolean
  }

  /** Live DNS via the JVM resolver — the deployment impl (unused in the
    * sandbox: no resolver here; specs use [[MockResolver]]). */
  object DnsResolver extends Resolver {
    def resolve(host: String): Boolean =
      try { java.net.InetAddress.getByName(host); true }
      catch { case _: java.net.UnknownHostException => false }
  }

  /** Planted-failure resolver for tests/oracles. */
  final case class MockResolver(failing: Set[String]) extends Resolver {
    def resolve(host: String): Boolean = !failing.contains(host)
  }

  /** Counter mirror of the reference's NutchMetrics hostdb group. */
  final case class CheckStats(checked: Long, newKnown: Long,
      existingKnown: Long, rediscovered: Long, newUnknown: Long,
      existingUnknown: Long, purged: Long)

  /** Run the DNS check over a merged hostdb: returns the surviving rows
    * (purged hosts dropped) and the outcome counters. One map pass — at
    * scale the resolver cost dominates, so hosts stay partitioned as
    * the merge left them (no extra shuffle). */
  def check(rows: Dataset[HostRow], resolver: Resolver, now: Long,
      purgeFailedHostsThreshold: Int = -1): (Dataset[HostRow], CheckStats) = {
    val spark = rows.sparkSession
    import spark.implicits._
    val sc = spark.sparkContext
    val accs = Seq("checked", "new_known", "existing_known", "rediscovered",
      "new_unknown", "existing_unknown", "purged")
      .map(n => n -> sc.longAccumulator(s"hostdb_$n")).toMap
    val bc = sc.broadcast((resolver, purgeFailedHostsThreshold))
    val out = rows.mapPartitions { it =>
      val (r, threshold) = bc.value
      it.flatMap { h =>
        val isNew = h.lastCheck == 0L
        accs("checked").add(1L)
        if (r.resolve(h.host)) {
          val name =
            if (isNew) "new_known"
            else if (h.dnsFailures > 0) "rediscovered"
            else "existing_known"
          accs(name).add(1L)
          Some(h.copy(lastCheck = now,
            dnsFailures = if (h.dnsFailures > 0 && !isNew) 0L
              else h.dnsFailures))
        } else if (isNew) {
          accs("new_unknown").add(1L)
          Some(h.copy(lastCheck = now, dnsFailures = 1L))
        } else {
          val failures = h.dnsFailures + 1
          if (threshold == -1 || threshold < failures) {
            accs("existing_unknown").add(1L)
            Some(h.copy(lastCheck = now, dnsFailures = failures))
          } else {
            accs("purged").add(1L)
            None
          }
        }
      }
    }
    // the map runs lazily; counters are valid only after an action —
    // materialize here (hostdb rounds install the result anyway)
    val materialized = out.cache()
    materialized.count()
    val stats = CheckStats(accs("checked").value, accs("new_known").value,
      accs("existing_known").value, accs("rediscovered").value,
      accs("new_unknown").value, accs("existing_unknown").value,
      accs("purged").value)
    (materialized, stats)
  }

  /** Numeric-field aggregations (hostdb.numeric.fields /
    * hostdb.percentiles, nutch-default.xml:2957-2979;
    * UpdateHostDbReducer.java:263-286,380-397): per-host min/max/avg
    * plus t-digest percentiles of numeric CrawlDatum metadata fields
    * — the reference keeps a TDigest(100) per (host, field) in its
    * reducer and emits `pct<P>.<field>` host metadata. Here the same
    * information lands as rows (host, field, cnt, min, max, avg,
    * pct...), one hash aggregation, digest state O(δ) per group —
    * joinable back onto the hostdb by host when a consumer wants the
    * metadata shape. One fidelity divergence, deliberate: the
    * reference's emit loop writes quantile(0.5) for EVERY requested
    * percentile (UpdateHostDbReducer.java:394's literal `.quantile(
    * 0.5)` inside the percentiles loop); here pct75 is the 0.75
    * quantile, as the config documents. */
  def numericStats(db: Dataset[CrawlRow],
      fields: Seq[String] = Seq("_rs_"),
      percentiles: Seq[Int] = Seq(50, 75, 95, 99)): DataFrame = {
    require(fields.nonEmpty && percentiles.nonEmpty)
    // try_cast: the reference skips unparseable values via parseFloat's
    // catch (UpdateHostDbReducer.java:270,287) — ANSI cast would throw
    val fv = array(fields.map(f => struct(lit(f).as("field"),
      col("datum.metadata").getItem(f).try_cast("double").as("v"))): _*)
    val digest = graft.functions.TDigest.quantileAgg(
      col("v"), percentiles.map(_ / 100.0))
    val aggCols = Seq(
      count(lit(1)).as("cnt"),
      min(col("v")).as("min"),
      max(col("v")).as("max"),
      avg(col("v")).as("avg")) ++
      percentiles.zipWithIndex.map { case (p, i) =>
        element_at(digest, i + 1).as(s"pct$p")
      }
    db.toDF()
      .withColumn("host", Urls.host(col("url")))
      .filter(col("host") =!= "")
      .select(col("host"), explode(fv).as("fv"))
      .select(col("host"), col("fv.field").as("field"), col("fv.v").as("v"))
      .filter(col("v").isNotNull)
      .groupBy("host", "field")
      .agg(aggCols.head, aggCols.tail: _*)
  }

  def apply(db: Dataset[CrawlRow], prev: Dataset[HostRow],
      now: Long): Dataset[HostRow] = {
    val spark: SparkSession = db.sparkSession
    import spark.implicits._
    def cnt(st: Byte) =
      count(when(col("datum.status") === st.toInt, 1)).as(
        CrawlStatus.name(st))
    val cur = db.toDF()
      .withColumn("host", Urls.host(col("url")))
      .filter(col("host") =!= "")
      .groupBy("host")
      .agg(cnt(CrawlStatus.DB_UNFETCHED), cnt(CrawlStatus.DB_FETCHED),
        cnt(CrawlStatus.DB_GONE), cnt(CrawlStatus.DB_REDIR_TEMP),
        cnt(CrawlStatus.DB_REDIR_PERM), cnt(CrawlStatus.DB_NOTMODIFIED),
        sum(col("datum.score")).cast("double").as("sum_score"))
    val p = prev.toDF().select(col("host"),
      col("dnsFailures").as("prev_dns"),
      col("connectionFailures").as("prev_conn"),
      col("score").as("prev_score"),
      col("lastCheck").as("prev_check"))
    cur.join(p, Seq("host"), "full_outer")
      .select(col("host"),
        coalesce(col("db_unfetched"), lit(0L)).as("unfetched"),
        coalesce(col("db_fetched"), lit(0L)).as("fetched"),
        coalesce(col("db_gone"), lit(0L)).as("gone"),
        coalesce(col("db_redir_temp"), lit(0L)).as("redirTemp"),
        coalesce(col("db_redir_perm"), lit(0L)).as("redirPerm"),
        coalesce(col("db_notmodified"), lit(0L)).as("notModified"),
        coalesce(col("prev_dns"), lit(0L)).as("dnsFailures"),
        coalesce(col("prev_conn"), lit(0L)).as("connectionFailures"),
        coalesce(col("sum_score"), col("prev_score"), lit(0.0)).as("score"),
        when(col("sum_score").isNotNull, lit(now))
          .otherwise(coalesce(col("prev_check"), lit(0L))).as("lastCheck"))
      .as[HostRow]
  }
}
