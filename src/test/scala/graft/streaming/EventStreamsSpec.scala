package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.streaming.EventStreams.Event

/** Drives the Structured Streaming transforms through MemoryStream
  * micro-batches and asserts windowed/stateful results. */
class EventStreamsSpec extends AnyFunSuite with SparkSuite {

  private val H = 3600000000L // 1h in µs
  private val base = 1700000000000000L // µs epoch, mid-hour agnostic

  test("hourly tumbling window aggregates per event_type") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.hourly(in.toDS())
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete").start()
    try {
      val t0 = (base / H) * H // aligned hour start
      in.addData(
        Event(1, 10, "view", t0 + 1, 1.25),
        Event(2, 11, "view", t0 + 2, 0.75),
        Event(3, 10, "click", t0 + 3, 2.0),
        Event(4, 10, "view", t0 + H + 1, 4.0)) // next hour
      q.processAllAvailable()
      val rows = spark.table("hourly")
        .collect().map(r => (r.getLong(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
      val h0 = t0 / 1000000L
      assert(rows((h0, "view")) == ((2L, 2.0, 1L)))
      assert(rows((h0, "click")) == ((1L, 2.0, 3L)))
      assert(rows((h0 + 3600, "view")) == ((1L, 4.0, 4L)))
    } finally q.stop()
  }

  test("windowed t-digest quantiles: state is the digest, estimates " +
      "hit the rank budget across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.valueQuantiles(in.toDS())
      .writeStream.format("memory").queryName("vq")
      .outputMode("complete").start()
    try {
      val t0 = (base / H) * H
      // 2000 deterministic values across 4 micro-batches — the digest
      // state must merge across batches, not just within one
      def v(i: Int): Double = (i * 37 % 1000) / 10.0
      val batches = (0 until 2000).map(i =>
        Event(i.toLong, i % 50L, "view", t0 + i, v(i)))
        .grouped(500).toSeq
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      val r = spark.table("vq").filter("event_type = 'view'")
        .collect().head
      assert(r.getLong(2) == 2000L)
      val sorted = (0 until 2000).map(v).sorted
      def rank(x: Double) = sorted.count(_ <= x) / 2000.0
      assert(math.abs(rank(r.getDouble(3)) - 0.5) <= 0.06,
        s"p50=${r.getDouble(3)}")
      assert(math.abs(rank(r.getDouble(4)) - 0.95) <= 0.02,
        s"p95=${r.getDouble(4)}")
      assert(math.abs(rank(r.getDouble(5)) - 0.99) <= 0.01,
        s"p99=${r.getDouble(5)}")
      assert(r.getDouble(3) <= r.getDouble(4) &&
        r.getDouble(4) <= r.getDouble(5))
    } finally q.stop()
  }

  test("windowed heavy hitters: MG summary as streaming state, exact " +
      "counts across micro-batches in the exact regime") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.topUsers(in.toDS(), k = 3)
      .writeStream.format("memory").queryName("topusers")
      .outputMode("complete").start()
    try {
      val t0 = (base / H) * H
      // window 1: user 7 × 6, user 3 × 4, user 9 × 2, user 1 × 1;
      // window 2: user 5 × 3, user 7 × 1 — split across 3 micro-batches
      // so the summary must merge through the state store
      val w1 = Seq.fill(6)(7L) ++ Seq.fill(4)(3L) ++ Seq.fill(2)(9L) :+ 1L
      val w2 = Seq.fill(3)(5L) :+ 7L
      val events =
        w1.zipWithIndex.map { case (u, i) =>
          Event(i.toLong, u, "view", t0 + i, 1.0) } ++
        w2.zipWithIndex.map { case (u, i) =>
          Event(100L + i, u, "view", t0 + H + i, 1.0) }
      events.grouped(6).foreach { b => in.addData(b); q.processAllAvailable() }
      val rows = spark.table("topusers").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      val h0 = t0 / 1000000
      // top-3 of window 1 (exact regime: est = truth, err = 0)
      assert(rows((h0, 7L)) == ((6L, 0L)))
      assert(rows((h0, 3L)) == ((4L, 0L)))
      assert(rows((h0, 9L)) == ((2L, 0L)))
      assert(!rows.contains((h0, 1L))) // k = 3 cuts the singleton
      assert(rows((h0 + 3600, 5L)) == ((3L, 0L)))
      assert(rows((h0 + 3600, 7L)) == ((1L, 0L)))
    } finally q.stop()
  }

  test("windowed heavy hitters break k-boundary ties NUMERICALLY " +
      "(user 9 beats user 10 at equal counts — not the string sort)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.topUsers(in.toDS(), k = 2)
      .writeStream.format("memory").queryName("topusers_ties")
      .outputMode("complete").start()
    try {
      val t0 = (base / H) * H
      // user 7 × 3; users 9 and 10 tie at 2 — the k=2 cut must keep
      // user 9 (numeric asc), though "10" < "9" lexicographically
      val us = Seq.fill(3)(7L) ++ Seq.fill(2)(9L) ++ Seq.fill(2)(10L)
      in.addData(us.zipWithIndex.map { case (u, i) =>
        Event(i.toLong, u, "view", t0 + i, 1.0) })
      q.processAllAvailable()
      val kept = spark.table("topusers_ties").collect()
        .map(r => r.getLong(1)).toSet
      assert(kept == Set(7L, 9L), kept)
    } finally q.stop()
  }

  test("typeDrift: per-window chi terms vs the broadcast expected mix " +
      "are integer-exact across micro-batches; unknown types flagged") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Event]
    val expected = Seq(("view", 5000L), ("click", 5000L))
      .toDF("event_type", "exp_bp")
    val q = EventStreams.typeDrift(in.toDS(), expected)
      .writeStream.format("memory").queryName("typedrift")
      .outputMode("complete").start()
    try {
      val t0 = (base / H) * H
      // one window: view×6, click×2, weird×2 — split over two
      // micro-batches so the sketch state merges through the store
      val types = Seq.fill(6)("view") ++ Seq.fill(2)("click") ++
        Seq.fill(2)("weird")
      val events = types.zipWithIndex.map { case (t, i) =>
        Event(i.toLong, i.toLong % 3, t, t0 + i, 1.0) }
      events.grouped(4).foreach { b => in.addData(b); q.processAllAvailable() }
      val rows = spark.table("typedrift").collect()
        .map(r => r.getString(1) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5),
            r.getLong(6))).toMap
      // hand-computed: tot=10 → obs_bp view 6000 click 2000 weird 2000
      assert(rows("view") == ((6L, 6000L, 5000L, false,
        (1000L * 1000L) / 5000L)), rows)
      assert(rows("click") == ((2L, 2000L, 5000L, false,
        (3000L * 3000L) / 5000L)), rows)
      assert(rows("weird") == ((2L, 2000L, 0L, true,
        2000L * 2000L)), rows)
    } finally q.stop()
  }

  test("sliding 10/5-minute windows: each event lands in two windows") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val M5 = 300000000L // 5 min in µs
    val in = MemoryStream[Event]
    val q = EventStreams.slidingRate(in.toDS())
      .writeStream.format("memory").queryName("sliding")
      .outputMode("complete").start()
    try {
      val t0 = (base / M5) * M5 // aligned 5-min slot start
      in.addData(
        Event(1, 10, "view", t0 + 1, 1.0), // windows t0-5m and t0
        Event(2, 11, "view", t0 + M5 + 1, 1.0)) // windows t0 and t0+5m
      q.processAllAvailable()
      val rows = spark.table("sliding")
        .collect().map(r => (r.getLong(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      val s0 = t0 / 1000000L
      assert(rows((s0 - 300, "view")) == ((1L, 1L)))
      assert(rows((s0, "view")) == ((2L, 1L))) // overlap window sees both
      assert(rows((s0 + 300, "view")) == ((1L, 2L)))
      // exactly 2 window memberships per event
      assert(rows.values.map(_._1).sum == 4)
      // the batch twin produces the same window starts for this data
      val batchStarts = Seq(t0 + 1, t0 + M5 + 1).flatMap { us =>
        val slot = (us * 1000) / 300000000000L // ns DIV 300e9
        Seq(slot * 300, (slot - 1) * 300)
      }.toSet
      assert(rows.keySet.map(_._1) == batchStarts)
    } finally q.stop()
  }

  test("stateful sessionization closes sessions across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.sessionize(in.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // batch 1: two events 10 min apart — one open session, nothing out
      in.addData(
        Event(1, 42, "view", base, 1.0),
        Event(2, 42, "view", base + 600000000L, 2.0))
      q.processAllAvailable()
      assert(spark.table("sessions").count() == 0)

      // batch 2: 31-min gap — closes session 1, opens session 2
      in.addData(Event(3, 42, "view", base + 600000000L + 1860000000L, 4.0))
      q.processAllAvailable()
      val closed = spark.table("sessions").as[EventStreams.SessionOut]
        .collect()
      assert(closed.length == 1)
      val s = closed.head
      assert(s.user_id == 42 && s.session_idx == 1)
      assert(s.n_events == 2 && s.first_event == 1 && s.last_event == 2)
      assert(s.duration_us == 600000000L)
      assert(s.sum_value == 3.0)

      // batch 3: another user interleaves; 31-min gap closes session 2
      in.addData(
        Event(5, 7, "view", base, 1.0),
        Event(4, 42, "view", base + 600000000L + 1860000000L * 2, 8.0))
      q.processAllAvailable()
      val all = spark.table("sessions").as[EventStreams.SessionOut]
        .collect().sortBy(s => (s.user_id, s.session_idx))
      assert(all.length == 2) // user 7's session still open
      assert(all.exists(s => s.user_id == 42 && s.session_idx == 2 &&
        s.n_events == 1 && s.sum_value == 4.0))
    } finally q.stop()
  }

  test("streaming dedup drops repeated signatures within the watermark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.dedupStream(in.toDS())
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      // same (event_type, value) signature three times + one distinct
      in.addData(
        Event(1, 10, "view", base, 1.25),
        Event(2, 11, "view", base + 1000000L, 1.25), // dup sig
        Event(3, 12, "click", base + 2000000L, 1.25))
      q.processAllAvailable()
      in.addData(Event(4, 13, "view", base + 3000000L, 1.25)) // dup again
      q.processAllAvailable()
      val out = spark.table("dedup").collect()
        .map(r => r.getLong(0) -> r.getString(1))
      assert(out.length == 2, out.mkString(","))
      assert(out.map(_._2).toSet == Set("view|125", "click|125"))
      // the survivor is the first arrival
      assert(out.toMap.get(1L).contains("view|125"))
    } finally q.stop()
  }

  test("stream-static dedup against a frozen store matches the batch join") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, md5}
    // duplicate sigs in the raw store must NOT multiply stream rows
    // (r8 ADVICE: the join de-dups store keys like the batch twin does)
    val storeTexts = Seq("alpha body", "alpha body", "beta body",
      "beta body", "gamma body")
    val store = storeTexts.toDF("text").select(md5(col("text")).as("sig"))
    val docs = Seq(
      EventStreams.Doc(1, "alpha body"), // re-crawl of a stored doc
      EventStreams.Doc(2, "fresh page"),
      EventStreams.Doc(3, "beta body"),
      EventStreams.Doc(4, "another fresh page"))
    val in = MemoryStream[EventStreams.Doc]
    val q = EventStreams.dedupAgainstStore(in.toDS(), store)
      .writeStream.format("memory").queryName("incdedup")
      .outputMode("append").start()
    try {
      in.addData(docs.take(2): _*)
      q.processAllAvailable()
      in.addData(docs.drop(2): _*) // second micro-batch re-reads the store
      q.processAllAvailable()
      val rows = spark.table("incdedup").collect()
      assert(rows.length == docs.length, // exactly one verdict per doc
        s"store dup sigs multiplied rows: ${rows.length}")
      val streamed = rows.map(r => r.getLong(0) -> r.getString(2)).toMap
      // batch A/B: the same join expressed as plain DataFrames
      val batch = EventStreams.dedupAgainstStore(docs.toDS(), store)
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      assert(streamed == batch)
      assert(streamed == Map(1L -> "drop_exact", 2L -> "keep",
        3L -> "drop_exact", 4L -> "keep"))
    } finally q.stop()
  }

  test("bloom-routed stream-static dedup (store past broadcast range) " +
    "is verdict-identical to the broadcast twin across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, md5}
    val root = java.nio.file.Files
      .createTempDirectory("stream-bloom-store").toString
    val storeDocs = (0 until 30)
      .map(i => (i.toLong, s"stored page $i body " + ("w" * (i % 5))))
      .toDF("doc_id", "text")
    graft.ops.DedupStore.install(storeDocs, root, buckets = 4)
    val (sigs, _) = graft.ops.DedupStore.open(spark, root, buckets = 4)
    val bloom = graft.ops.DedupStore.openSigBloom(spark, root).get

    val docs = Seq(
      EventStreams.Doc(100, "stored page 3 body www"), // store hit
      EventStreams.Doc(101, "fresh text one"),
      EventStreams.Doc(102, "stored page 7 body ww"), // store hit
      EventStreams.Doc(103, "fresh text two"),
      EventStreams.Doc(104, "fresh text three"))
    val in = MemoryStream[EventStreams.Doc]
    val q = EventStreams.dedupAgainstStoreBloom(in.toDS(), sigs, bloom)
      .writeStream.format("memory").queryName("bloomdedup")
      .outputMode("append").start()
    try {
      in.addData(docs.take(3): _*)
      q.processAllAvailable()
      in.addData(docs.drop(3): _*)
      q.processAllAvailable()
      val rows = spark.table("bloomdedup").collect()
      assert(rows.length == docs.length, rows.mkString(","))
      val streamed = rows.map(r => r.getLong(0) -> r.getString(2)).toMap
      val broadcastTwin = EventStreams.dedupAgainstStore(docs.toDS(),
          sigs.select(col("store_sig").as("sig")))
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      assert(streamed == broadcastTwin)
      assert(streamed == Map(100L -> "drop_exact", 101L -> "keep",
        102L -> "drop_exact", 103L -> "keep", 104L -> "keep"))
    } finally {
      q.stop()
      spark.catalog.listTables().collect().map(_.name)
        .filter(_.startsWith("graft_dedupstore_"))
        .foreach(n => spark.sql(s"DROP TABLE `$n`"))
    }
  }

  test("asofEnrich carries the latest prior view across micro-batches " +
    "with the equal-ts and tie disciplines of the batch query") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.asofEnrich(in.toDS())
      .writeStream.format("memory").queryName("asof")
      .outputMode("append").start()
    try {
      // batch 1: view at t0, two equal-ts views at t1 (max event_id
      // must win), a purchase AT t1 (ties are not prior -> sees t0),
      // a purchase with no prior view for another user
      in.addData(
        Event(10, 1, "view", base, 0),
        Event(11, 1, "purchase", base + H, 0),
        Event(12, 1, "view", base + H, 0),
        Event(13, 1, "view", base + H, 0),
        Event(20, 2, "purchase", base, 0))
      q.processAllAvailable()
      // batch 2: purchase after the equal-ts pair -> max event_id view;
      // state carried across the batch boundary
      in.addData(Event(14, 1, "purchase", base + 2 * H, 0))
      q.processAllAvailable()
      val rows = spark.table("asof").as[EventStreams.AsofOut]
        .collect().map(o => o.purchase_event ->
          ((o.view_event, o.gap_us))).toMap
      assert(rows(11L) == ((Some(10L), Some(H))))     // tie not prior
      assert(rows(20L) == ((None, None)))             // no prior view
      assert(rows(14L) == ((Some(13L), Some(H))))     // max-id tie view

      // CROSS-BATCH tie: a view with the SAME ts as a later-batch
      // purchase is already in state — strictness must hold by value
      // (the second state layer serves the strictly-prior answer)
      in.addData(
        Event(30, 9, "view", base, 0),
        Event(31, 9, "view", base + H, 0))
      q.processAllAvailable()
      in.addData(
        Event(32, 9, "purchase", base + H, 0),  // ties newest view
        Event(33, 9, "purchase", base, 0))      // ties the prev layer
      q.processAllAvailable()
      val r2 = spark.table("asof").as[EventStreams.AsofOut]
        .collect().map(o => o.purchase_event ->
          ((o.view_event, o.gap_us))).toMap
      assert(r2(32L) == ((Some(30L), Some(H))), r2(32L)) // falls back
      assert(r2(33L) == ((None, None)), r2(33L))         // nothing prior
    } finally q.stop()
  }

  test("asofEnrich is row-identical to the oracle-checked batch " +
    "asof_join on the real events table") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val evs = graft.Tables(spark, sf, "events")
      .selectExpr("event_id", "user_id", "event_type",
        "ts div 1000 as ts_us", "value")
      .as[Event].collect().toSeq
    val in = MemoryStream[Event]
    val q = EventStreams.asofEnrich(in.toDS())
      .writeStream.format("memory").queryName("asof_ab")
      .outputMode("append").start()
    try {
      in.addData(evs: _*)
      q.processAllAvailable()
      val streamed = spark.table("asof_ab").as[EventStreams.AsofOut]
        .collect()
        .map(o => (o.purchase_event, o.user_id,
          o.view_event.getOrElse(-1L), o.gap_us.getOrElse(-1L)))
        .toSet
      val batch = graft.Queries.byName("asof_join").build(spark, sf)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))
        .toSet
      assert(streamed == batch,
        s"stream-only: ${(streamed -- batch).take(3)} " +
          s"batch-only: ${(batch -- streamed).take(3)}")
    } finally q.stop()
  }

  // TTL specs (r13 verdict Next #7): armed ProcessingTimeTimeout makes
  // shouldRunAnotherBatch always true, so processAllAvailable-style
  // waits can livelock — these poll the memory sink with a deadline
  // under an explicit short processing-time trigger instead.

  test("sessionize stateTtl: an idle user's open session is emitted " +
    "as closed on eviction, and a later event starts fresh") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.sessionize(in.toDS(),
        stateTtl = Some(java.time.Duration.ofSeconds(1)))
      .writeStream.format("memory").queryName("sessions_ttl")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .start()
    def rows() = spark.table("sessions_ttl")
      .as[EventStreams.SessionOut].collect()
    def awaitRows(n: Int): Unit = {
      val deadline = System.currentTimeMillis() + 90000
      while (rows().length < n && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      assert(rows().length >= n,
        s"sink has ${rows().length} rows, wanted $n (TTL never fired?)")
    }
    try {
      // one OPEN session; nothing emits until the TTL evicts it
      in.addData(
        Event(1, 42, "view", base, 1.0),
        Event(2, 42, "view", base + 1000000L, 2.0))
      awaitRows(1)
      val s = rows().head
      assert(s.user_id == 42 && s.session_idx == 1)
      assert(s.n_events == 2 && s.first_event == 1 && s.last_event == 2)
      assert(s.duration_us == 1000000L && s.sum_value == 3.0)
      // the user was EVICTED, not just flushed: the next activity is a
      // brand-new user to the operator — session_idx restarts at 1
      in.addData(Event(3, 42, "view", base + 2000000L, 4.0))
      awaitRows(2) // its own eviction emits it
      assert(rows().count(r => r.session_idx == 1 && r.user_id == 42) == 2)
      assert(rows().exists(r => r.n_events == 1 && r.first_event == 3))
    } finally q.stop()
  }

  test("asofEnrich stateTtl: an evicted user's next purchase reports " +
    "no prior view (bounded store semantics)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.asofEnrich(in.toDS(),
        stateTtl = Some(java.time.Duration.ofSeconds(1)))
      .writeStream.format("memory").queryName("asof_ttl")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .start()
    def rows() = spark.table("asof_ttl").as[EventStreams.AsofOut].collect()
    try {
      in.addData(Event(1, 7, "view", base, 1.0))
      // wait well past the TTL so the idle view-state is evicted
      // (batches run continuously while a timeout is armed)
      Thread.sleep(5000)
      in.addData(Event(2, 7, "purchase", base + 1000000L, 2.0))
      val deadline = System.currentTimeMillis() + 90000
      while (rows().isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      assert(rows().length == 1, s"got ${rows().length} rows")
      val o = rows().head
      // the view at base is LOST by construction: eviction == the
      // TTL-windowed-input batch answer
      assert(o.purchase_event == 2 && o.user_id == 7)
      assert(o.view_event.isEmpty && o.gap_us.isEmpty, o)
    } finally q.stop()
  }
}
