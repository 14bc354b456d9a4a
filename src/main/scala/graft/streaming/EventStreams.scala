package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** True Structured Streaming twins of the batch stream queries
  * (QueriesStream): readStream → watermark → windowed agg, and stateful
  * sessionization via flatMapGroupsWithState
  * (KeyValueGroupedDataset.flatMapGroupsWithState — SURVEY §2.11).
  *
  * The batch queries stay the oracle-checkable surface; these transforms
  * accept a streaming Dataset (e.g. MemoryStream in tests, Kafka/files
  * in production) and are covered by EventStreamsSpec.
  */
object EventStreams {

  final case class Event(event_id: Long, user_id: Long, event_type: String,
      ts_us: Long, value: Double)

  /** Hourly tumbling-window aggregate with a 2-hour watermark. Late data
    * beyond the watermark is dropped, matching a 2h-bounded state size.
    * (Streaming disallows exact countDistinct; the batch twin carries the
    * oracle-checked n_users.) */
  def hourly(events: Dataset[Event]): DataFrame =
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100, 0).cast("long")).as("sum_value_fx"),
        min(col("event_id")).as("first_event"))
      .select(
        (unix_timestamp(col("window.start"))).as("hour_epoch"),
        col("event_type"), col("n_events"),
        (col("sum_value_fx").cast("double") / 100).as("sum_value"),
        col("first_event"))

  final case class SessionState(sessionIdx: Long, startUs: Long,
      lastUs: Long, n: Long, firstEvent: Long, lastEvent: Long, sumFx: Long)

  final case class SessionOut(user_id: Long, session_idx: Long,
      n_events: Long, first_event: Long, last_event: Long,
      duration_us: Long, sum_value: Double)

  val GapUs: Long = 1800000000L // 30 min, exact µs integers

  /** Sliding-window rate metric: 10-minute windows every 5 minutes per
    * event_type with a 2-hour watermark — each event lands in exactly 2
    * overlapping windows, so state is bounded by (horizon/slide) ×
    * distinct event types. Batch oracle twin: QueriesStream.slidingRate
    * (exact integer slot math, same window starts). */
  def slidingRate(events: Dataset[Event]): DataFrame =
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        min(col("event_id")).as("first_event"))
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n_events"), col("first_event"))

  /** Per-window distribution drift — the streaming face of the batch
    * `source_drift` corpus-QA gate: per hourly window, a chi-square-
    * shaped statistic on QUANTIZED rates over the event-type mix,
    * against a BROADCAST expected-mix table (the batch census a
    * monitoring deployment refreshes daily). Integer-exact per window:
    * obs_bp = type count × 10000 div window total, contribution =
    * (obs_bp − exp_bp)² div max(exp_bp, 1); absent expected types are
    * flagged rather than divided by zero. A window whose stat clears
    * the caller's threshold is a scraper break / flood / upstream
    * shift, caught while it streams instead of at the next corpus
    * build. State: one count per (window, type) — bounded by the
    * watermark horizon × type cardinality; the expected table rides
    * the stream-static broadcast join, so the corpus's hottest keys
    * never become streaming-state keys beyond their window counts. */
  def typeDrift(events: Dataset[Event], expectedBp: DataFrame,
      capacity: Int = 2048): DataFrame =
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"))
      // ONE stateful aggregation per window (streaming allows neither
      // window functions nor chained aggregations): total + the MG
      // summary of type counts — exact whenever capacity ≥ the type
      // cardinality (MGSpec's exact-regime contract), O(capacity)
      // state either way
      .agg(count(lit(1)).as("tot"),
        graft.functions.FreqSketch.mgTopK(col("event_type"), capacity)
          .as("hh"))
      .select(unix_timestamp(col("window.start")).as("hour_epoch"),
        col("tot"), explode(col("hh")).as("e"))
      .select(col("hour_epoch"), col("e.key").as("event_type"),
        col("e.est").as("n"), col("tot"))
      .join(broadcast(expectedBp), Seq("event_type"), "left")
      .select(col("hour_epoch"), col("event_type"), col("n"),
        expr("n * 10000 div tot").as("obs_bp"),
        coalesce(col("exp_bp"), lit(0L)).as("exp_bp"),
        col("exp_bp").isNull.as("unexpected_type"))
      .withColumn("chi_term",
        expr("(obs_bp - exp_bp) * (obs_bp - exp_bp)" +
          " div greatest(exp_bp, 1)"))

  /** Hourly t-digest value quantiles per event type — the streaming
    * face of the reference's latency/score sketches (Fetcher.java:
    * 507-525 merges MergingDigest(100) across fetch threads; here the
    * digest is the windowed-aggregation STATE, serialized into the
    * state store via the aggregate's own byte codec, merged across
    * micro-batches by the engine's partial-merge calls — O(δ) state
    * per (window, type) at any event rate). Watermark bounds state
    * exactly like [[hourly]]. Quantile read-outs are estimates
    * (merge-order-dependent), so the oracle surface is the batch
    * tdigest_values contract query; EventStreamsSpec asserts the
    * streamed estimates hit the same rank-error budget against the
    * exact per-window data. */
  def valueQuantiles(events: Dataset[Event]): DataFrame =
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        graft.functions.TDigest.quantileAgg(col("value"),
          Seq(0.5, 0.95, 0.99)).as("qv"))
      .select(
        unix_timestamp(col("window.start")).as("hour_epoch"),
        col("event_type"), col("n_events"),
        element_at(col("qv"), 1).as("p50"),
        element_at(col("qv"), 2).as("p95"),
        element_at(col("qv"), 3).as("p99"))

  /** Streaming heavy hitters — the MG summary as windowed-aggregation
    * STATE (the [[valueQuantiles]] pattern with the frequency sketch
    * instead of the quantile sketch): per hourly window, the top users
    * by event count, with O(capacity) state per window regardless of
    * event rate or distinct-user count — a plain per-(window, user)
    * count would key streaming state on every distinct user seen in
    * the horizon. The summary merges across micro-batches through the
    * aggregate's own byte codec; watermark bounds state like
    * [[hourly]]. Estimates are exact whenever capacity ≥ the window's
    * distinct users (MGSpec's exact-regime contract — EventStreamsSpec
    * asserts the streamed counts equal the exact per-window census);
    * past capacity they carry the summary's documented err bound. */
  def topUsers(events: Dataset[Event], k: Int,
      capacity: Int = 2048): DataFrame =
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(graft.functions.FreqSketch.mgTopK(
        col("user_id").cast("string"), capacity).as("hh"))
      // the summary sorts by (est desc, key asc) over STRING keys, so
      // a k-boundary tie would cut lexicographically ("10" < "9") —
      // surprising for a numeric id and divergent from any batch
      // top-k ordered numerically. Re-sort with a numeric tie-break
      // before the cut (array_sort comparator: per-row, stateless —
      // streaming-safe where a global sort is not).
      .select(unix_timestamp(col("window.start")).as("hour_epoch"),
        expr(s"""slice(array_sort(hh, (l, r) -> CASE
            WHEN l.est > r.est THEN -1 WHEN l.est < r.est THEN 1
            WHEN CAST(l.key AS BIGINT) < CAST(r.key AS BIGINT) THEN -1
            WHEN CAST(l.key AS BIGINT) > CAST(r.key AS BIGINT) THEN 1
            ELSE 0 END), 1, $k)""").as("top"))
      .select(col("hour_epoch"), explode(col("top")).as("e"))
      .select(col("hour_epoch"), col("e.key").cast("long").as("user_id"),
        col("e.est").as("n_events"), col("e.err").as("err"))

  /** Streaming exact dedup — the LLM-pipeline ingest shape: drop events
    * whose dedup key (e.g. a content signature) was already seen within
    * the watermark horizon. `dropDuplicatesWithinWatermark` keys state
    * on the signature alone and expires it WITH the watermark — without
    * the horizon, streaming dedup state grows forever. Keyed on
    * (event_type, value-cents) as the stand-in signature. */
  def dedupStream(events: Dataset[Event]): DataFrame =
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withColumn("sig",
        concat_ws("|", col("event_type"),
          round(col("value") * 100, 0).cast("long")))
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("sig")
      .select(col("event_id"), col("sig"), col("ts"))

  /** Stateful sessionization: a >30-minute gap starts a new session.
    * Emits a session when it closes (next session opens) — the streaming
    * form of the batch lag+running-sum twin; state is O(1) per user.
    *
    * STATE BOUND (r13 verdict Next #7, the [[asofEnrich]] discipline):
    * O(1) per user but the USER SET is unbounded on a long-running
    * stream, so a production deployment should pass `stateTtl`. An
    * idle-past-TTL user's OPEN session is emitted as closed on
    * eviction (an inactivity close — the semantics a session gap
    * already encodes; a later event starts the next session index
    * fresh at 1, as for a new user). Default None = NoTimeout, exact
    * batch-twin row identity — arming ProcessingTimeTimeout makes the
    * engine schedule micro-batches continuously to expire state,
    * which livelocks processAllAvailable-style harnesses (see
    * [[asofEnrich]]'s scaladoc for the full trade). */
  def sessionize(events: Dataset[Event],
      stateTtl: Option[java.time.Duration] = None): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append,
        stateTtl.map(_ => GroupStateTimeout.ProcessingTimeTimeout)
          .getOrElse(GroupStateTimeout.NoTimeout)) {
        (userId: Long, batch: Iterator[Event],
            state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // idle past the TTL: close and EMIT the open session (a
            // session that outlives the TTL without new events has
            // ended by definition), then evict the user
            val st = state.getOption.orNull
            state.remove()
            if (st == null) Iterator.empty
            else Iterator.single(SessionOut(userId, st.sessionIdx, st.n,
              st.firstEvent, st.lastEvent, st.lastUs - st.startUs,
              st.sumFx / 100.0))
          } else {
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          var st = state.getOption.orNull
          batch.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            val fx = math.round(e.value * 100)
            if (st == null) {
              st = SessionState(1L, e.ts_us, e.ts_us, 1L, e.event_id,
                e.event_id, fx)
            } else if (e.ts_us - st.lastUs > GapUs) {
              out += SessionOut(userId, st.sessionIdx, st.n, st.firstEvent,
                st.lastEvent, st.lastUs - st.startUs, st.sumFx / 100.0)
              st = SessionState(st.sessionIdx + 1, e.ts_us, e.ts_us, 1L,
                e.event_id, e.event_id, fx)
            } else {
              st = st.copy(lastUs = e.ts_us, n = st.n + 1,
                lastEvent = math.max(st.lastEvent, e.event_id),
                firstEvent = math.min(st.firstEvent, e.event_id),
                sumFx = st.sumFx + fx)
            }
          }
          if (st != null) state.update(st)
          // sliding inactivity clock, re-armed per touching batch
          if (st != null) stateTtl.foreach(d =>
            state.setTimeoutDuration(d.toMillis))
          out.iterator
          }
      }
  }

  final case class Doc(doc_id: Long, text: String)

  /** Ingest-time incremental dedup — the streaming twin of the batch
    * `incremental_dedup` query's exact stage: documents arriving on a
    * stream are checked against the FROZEN corpus store (a static
    * DataFrame of md5 `sig` keys). Stream-static joins are STATELESS
    * in Structured Streaming — the static side is re-read (and here
    * broadcast) per micro-batch, so state never grows with stream
    * length; within-increment duplicates compose upstream via
    * `dropDuplicatesWithinWatermark` (see [[dedupStream]]). At 100 TB
    * the store is the materialized signature parquet the batch query
    * describes; a store refresh is a new file the next micro-batch
    * picks up. */
  def dedupAgainstStore(docs: Dataset[Doc], store: DataFrame): DataFrame =
    docs.withColumn("sig", md5(col("text")))
      .join(broadcast(store.select(col("sig")).distinct()
          .withColumn("hit", lit(1))),
        Seq("sig"), "left")
      .select(col("doc_id"), col("sig"),
        when(col("hit").isNotNull, lit("drop_exact"))
          .otherwise(lit("keep")).as("verdict"))

  /** [[dedupAgainstStore]] past broadcast range: when the frozen store
    * is too large to broadcast its keys (10^9+ docs), broadcast its
    * BLOOM FILTER instead (DedupStore's `sigbloom` sidecar, ~10
    * bits/key) and route only the filter's maybes — true dups + the
    * fpp mass — through a stream-static join against the store's
    * bucketed `sigs` table read in place; definite-absent rows (the
    * overwhelming majority of fresh crawl text) short-circuit to
    * `keep` map-side without touching the store at all. Both branches
    * are stateless (stream-static joins re-read the static side per
    * micro-batch; the filter is a one-row static frame), so state
    * never grows with stream length, and zero false negatives make the
    * verdicts byte-identical to [[dedupAgainstStore]] —
    * EventStreamsSpec asserts that A/B across micro-batches. */
  def dedupAgainstStoreBloom(docs: Dataset[Doc], storeSigs: DataFrame,
      sigBloom: DataFrame): DataFrame = {
    import graft.functions.{Bloom, Hashing}
    // the crossJoin(broadcast) filter shape is safe HERE, unlike in
    // DedupStore.exactProbe: the downstream store join is LEFT OUTER,
    // which neither ReorderJoin nor PushDownLeftSemiAntiJoin moves
    // below the prefilter (only inner/cross chains and semi/anti joins
    // reorder) — and a scalar subquery is not available on a streaming
    // frame anyway
    val sigged = docs.withColumn("sig", md5(col("text")))
      .crossJoin(broadcast(sigBloom))
      .withColumn("maybe",
        Bloom.mightContain(col("bloom"), Hashing.fast64(col("sig"))))
      .drop("bloom")
    val checked = sigged.filter(col("maybe"))
      .join(storeSigs.select(col("store_sig").as("sig"))
          .withColumn("hit", lit(1)),
        Seq("sig"), "left")
      .select(col("doc_id"), col("sig"),
        when(col("hit").isNotNull, lit("drop_exact"))
          .otherwise(lit("keep")).as("verdict"))
    val fresh = sigged.filter(!col("maybe"))
      .select(col("doc_id"), col("sig"), lit("keep").as("verdict"))
    checked.unionByName(fresh)
  }

  /** Per-user as-of state: the newest view (ts, max event_id at that
    * ts) plus the newest view at a STRICTLY SMALLER ts — the layer a
    * ts-tied purchase falls back to. prevTs = Long.MinValue ⇒ no
    * prior layer yet. */
  final case class AsofState(viewTs: Long, viewEvent: Long,
      prevTs: Long, prevEvent: Long)
  final case class AsofOut(purchase_event: Long, user_id: Long,
      view_event: Option[Long], gap_us: Option[Long])

  /** Point-in-time enrichment — the streaming twin of the batch
    * `asof_join` query: each purchase is emitted with the latest
    * STRICTLY PRIOR view by the same user. State per user is O(1) —
    * the two newest distinct view timestamps (each with its max
    * event_id) — where a stream-stream interval join would buffer a
    * watermark's worth of BOTH sides. Within a micro-batch, events
    * process in (ts, type-rank, event_id) order with purchases BEFORE
    * views at equal ts (the batch query's rank discipline); ACROSS
    * micro-batches strictness is enforced by value, not order: a
    * purchase whose ts ties the newest stored view falls back to the
    * strictly-smaller second layer, exactly the batch answer. The
    * running max-layer updates make out-of-order VIEW arrival
    * harmless at any batch boundary; a purchase arriving after views
    * NEWER than its own second-layer ts (more than one distinct
    * future view ts ahead) is the one ordering contract left (the
    * sessionize discipline), and it degrades to no-match, never to a
    * future view.
    *
    * STATE BOUND (the r12 ADVICE item): keyed state is O(1) per user
    * but the USER SET is unbounded on a long-running stream — a
    * production deployment should pass `stateTtl` so idle users are
    * evicted after that much processing-time inactivity. Semantics
    * after eviction: a purchase by an evicted user re-enters as a
    * fresh user and reports no prior view — the same answer a batch
    * job over a TTL-windowed input gives. The default is None
    * (NoTimeout, exact batch-twin row identity over any replay
    * horizon) DELIBERATELY: arming ProcessingTimeTimeout makes
    * FlatMapGroupsWithStateExec.shouldRunAnotherBatch always true, so
    * the engine schedules micro-batches continuously to expire state
    * — correct and cheap on a real trigger, but it livelocks
    * processAllAvailable-style test harnesses and burns cycles on
    * idle default-trigger streams. Opting in = choosing that trade
    * for a bounded store. */
  def asofEnrich(events: Dataset[Event],
      stateTtl: Option[java.time.Duration] = None): Dataset[AsofOut] = {
    import events.sparkSession.implicits._
    events
      .filter(e => e.event_type == "view" || e.event_type == "purchase")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofState, AsofOut](
        OutputMode.Append,
        stateTtl.map(_ => GroupStateTimeout.ProcessingTimeTimeout)
          .getOrElse(GroupStateTimeout.NoTimeout)) {
        (userId: Long, batch: Iterator[Event],
            state: GroupState[AsofState]) =>
          if (state.hasTimedOut) {
            // idle past the TTL: evict and emit nothing — the group
            // was only invoked to expire
            state.remove()
            Iterator.empty
          } else {
          val out = scala.collection.mutable.ArrayBuffer.empty[AsofOut]
          var st = state.getOption.orNull
          batch.toSeq
            .sortBy(e => (e.ts_us,
              if (e.event_type == "purchase") 0 else 1, e.event_id))
            .foreach { e =>
              if (e.event_type == "purchase") {
                out += (if (st == null) AsofOut(e.event_id, userId, None, None)
                  else if (st.viewTs < e.ts_us)
                    AsofOut(e.event_id, userId, Some(st.viewEvent),
                      Some(e.ts_us - st.viewTs))
                  else if (st.prevTs > Long.MinValue && st.prevTs < e.ts_us)
                    AsofOut(e.event_id, userId, Some(st.prevEvent),
                      Some(e.ts_us - st.prevTs))
                  else AsofOut(e.event_id, userId, None, None))
              } else if (st == null) {
                st = AsofState(e.ts_us, e.event_id, Long.MinValue, -1L)
              } else if (e.ts_us > st.viewTs) {
                st = AsofState(e.ts_us, e.event_id, st.viewTs, st.viewEvent)
              } else if (e.ts_us == st.viewTs) {
                if (e.event_id > st.viewEvent)
                  st = st.copy(viewEvent = e.event_id)
              } else if (e.ts_us > st.prevTs) {
                st = st.copy(prevTs = e.ts_us, prevEvent = e.event_id)
              } else if (e.ts_us == st.prevTs && e.event_id > st.prevEvent) {
                st = st.copy(prevEvent = e.event_id)
              }
            }
          if (st != null) state.update(st)
          // (re)arm the idle clock on every batch that touched the
          // group — TTL is sliding inactivity, not absolute age
          if (st != null) stateTtl.foreach(d =>
            state.setTimeoutDuration(d.toMillis))
          out.iterator
          }
      }
  }
}
