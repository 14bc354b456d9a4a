package graft.net

import scala.collection.mutable

/** Politeness pacer — the per-task scheduling core of the reference's
  * fetcher (FetchItemQueue.java:49-65,124-140 per-host nextFetchTime,
  * FetchItemQueues.java:81-86 round-robin across host queues,
  * Fetcher.java:277-281,338-360 time-limit and throughput watchdog).
  *
  * Pure and clock-injected: no Spark, no real sleeps in tests. Inside
  * the Fetch operator each partition builds one Pacer over its
  * co-located hosts; at scale the partition count is the fleet-wide
  * parallelism and the pacer keeps each host serialized + delayed while
  * hosts interleave within the task.
  *
  * Delay resolution per host (first item wins, as in
  * FetchItemQueue.addFetchItem:102-117):
  *   `_variableFetchDelay_` metadata (from the HostDb generator) >
  *   robots crawl-delay (dropped entirely when above maxCrawlDelay —
  *   FetcherThread robots handling) > configured server delay.
  */
object Pacer {

  trait Clock extends Serializable {
    def now(): Long
    def sleepUntil(t: Long): Unit
  }

  /** Real wall clock (production). */
  object SystemClock extends Clock {
    def now(): Long = System.currentTimeMillis()
    def sleepUntil(t: Long): Unit = {
      var d = t - now()
      while (d > 0) { Thread.sleep(d); d = t - now() }
    }
  }

  /** Deterministic test clock: sleeping advances virtual time. */
  final class VirtualClock(start: Long) extends Clock {
    private var t = start
    def now(): Long = t
    def sleepUntil(x: Long): Unit = if (x > t) t = x
    /** external cost model: fetching itself takes time */
    def advance(ms: Long): Unit = t += ms
  }

  final case class Config(
      serverDelayMs: Long = 1000, // fetcher.server.delay
      minCrawlDelayMs: Long = 0, // fetcher.server.min.delay
      maxCrawlDelayMs: Long = 30000, // fetcher.max.crawl.delay
      timeLimitMs: Long = -1, // fetcher.timelimit budget (rel. to start)
      // fetcher.throughput.threshold.pages (+ .check.after): drain when
      // average pages/sec sinks below the floor after the grace period
      throughputPagesPerSec: Int = -1,
      throughputCheckAfterMs: Long = 60000)

  sealed trait DrainReason
  case object TimeLimit extends DrainReason
  case object LowThroughput extends DrainReason
  case object ExcessCrawlDelay extends DrainReason

  final case class Item[T](host: String, payload: T,
      delayOverrideMs: Option[Long] = None,
      robotsDelayMs: Option[Long] = None)

  /** Run every item: `fetch(payload, at)` in paced order, or
    * `drain(payload, reason)` for items given up on. Items of one host
    * run serialized ≥ delay apart; distinct hosts interleave (each
    * pass picks the host that becomes ready first). */
  def run[T](items: Iterable[Item[T]], cfg: Config, clock: Clock)(
      fetch: (T, Long) => Unit)(drain: (T, DrainReason) => Unit): Unit =
    pacedMap(items, cfg, clock)((p, at) => fetch(p, at))((p, r) =>
      drain(p, r)).foreach(_ => ())

  /** The streaming form: a LAZY iterator of results — each `next()`
    * sleeps to the next host's ready time, runs `fetch` (so the
    * per-host delay is measured from fetch COMPLETION, like
    * FetchItemQueue.finishFetchItem), and yields its result; drained
    * items yield `drain`'s result. Nothing is buffered — inside Spark's
    * mapPartitions the downstream consumes each page (content bytes
    * included) as it is fetched instead of holding the whole
    * partition's payloads in memory. */
  def pacedMap[T, R](items: Iterable[Item[T]], cfg: Config, clock: Clock)(
      fetch: (T, Long) => R)(drain: (T, DrainReason) => R): Iterator[R] = {
    val start = clock.now()
    val deadline = if (cfg.timeLimitMs > 0) start + cfg.timeLimitMs else Long.MaxValue

    final class HostQ(val host: String) {
      val q = mutable.Queue.empty[Item[T]]
      var nextTime: Long = start
      var delayMs: Long = cfg.serverDelayMs
      var delaySet = false
      // the max.crawl.delay drop applies ONLY to the robots-declared
      // delay (FetcherThread robots handling) — never to the
      // generator's _variableFetchDelay_ override or the server default
      var robotsExcess = false
    }
    val order = mutable.ArrayBuffer.empty[HostQ]
    val byHost = mutable.HashMap.empty[String, HostQ]
    for (it <- items) {
      val hq = byHost.getOrElseUpdate(it.host, {
        val h = new HostQ(it.host); order += h; h
      })
      // first-item-wins delay resolution (FetchItemQueue.addFetchItem)
      if (!hq.delaySet) {
        hq.delaySet = true
        hq.delayMs = math.max(cfg.minCrawlDelayMs,
          it.delayOverrideMs
            .orElse(it.robotsDelayMs)
            .getOrElse(cfg.serverDelayMs))
        hq.robotsExcess = it.delayOverrideMs.isEmpty &&
          cfg.maxCrawlDelayMs >= 0 &&
          it.robotsDelayMs.exists(_ > cfg.maxCrawlDelayMs)
      }
      hq.q.enqueue(it)
    }
    // hosts whose robots crawl-delay exceeds the cap are dropped outright
    val (excess, kept) = order.partition(_.robotsExcess)

    // earliest-ready host via a heap: O(log H) per fetch instead of a
    // linear scan over every host queue in the partition. Ties on
    // nextTime break by arrival order (seq) = round-robin.
    val heap = mutable.PriorityQueue.empty[(Long, Long, HostQ)](
      Ordering.by[(Long, Long, HostQ), (Long, Long)] {
        case (t, seq, _) => (-t, -seq)
      })
    var seqNo = 0L
    for (h <- kept if h.q.nonEmpty) { heap.enqueue((h.nextTime, seqNo, h)); seqNo += 1 }

    new Iterator[R] {
      private val excessIt = excess.iterator.flatMap(_.q)
      private var fetched = 0L
      private var draining: Option[DrainReason] = None

      def hasNext: Boolean = excessIt.hasNext || heap.nonEmpty

      def next(): R = {
        if (excessIt.hasNext)
          return drain(excessIt.next().payload, ExcessCrawlDelay)
        draining match {
          case Some(reason) =>
            // watchdog tripped: everything left streams out as drained
            val (_, _, h) = heap.head
            val it = h.q.dequeue()
            if (h.q.isEmpty) heap.dequeue()
            drain(it.payload, reason)
          case None =>
            while (true) {
              val now = clock.now()
              if (now >= deadline) {
                draining = Some(TimeLimit); return next()
              }
              if (cfg.throughputPagesPerSec > 0 &&
                  now - start > cfg.throughputCheckAfterMs &&
                  fetched * 1000L <
                    cfg.throughputPagesPerSec * (now - start)) {
                draining = Some(LowThroughput); return next()
              }
              val (t, _, h) = heap.head
              if (t > now) {
                // never sleep past the deadline — drain on next loop
                clock.sleepUntil(math.min(t, deadline))
              } else {
                heap.dequeue()
                val it = h.q.dequeue()
                val r = fetch(it.payload, clock.now())
                fetched += 1
                h.nextTime = clock.now() + h.delayMs
                if (h.q.nonEmpty) {
                  heap.enqueue((h.nextTime, seqNo, h)); seqNo += 1
                }
                return r
              }
            }
            throw new IllegalStateException("unreachable")
        }
      }
    }
  }
}
