package graft.net

import org.scalatest.funsuite.AnyFunSuite

/** Clock-injected politeness-pacer tests — no real sleeps anywhere
  * (FetchItemQueue nextFetchTime, FetchItemQueues round-robin,
  * Fetcher time-limit/throughput drain semantics). */
class PacerSpec extends AnyFunSuite {

  private def run(items: Seq[Pacer.Item[String]], cfg: Pacer.Config,
      start: Long = 0L)
      : (Vector[(String, Long)], Vector[(String, Pacer.DrainReason)]) = {
    val clock = new Pacer.VirtualClock(start)
    var fetched = Vector.empty[(String, Long)]
    var drained = Vector.empty[(String, Pacer.DrainReason)]
    Pacer.run(items, cfg, clock)((p, at) => fetched :+= (p, at))(
      (p, r) => drained :+= (p, r))
    (fetched, drained)
  }

  test("per-host serialization honors the crawl delay") {
    val items = (1 to 3).map(i => Pacer.Item("a.com", s"a$i"))
    val (fetched, drained) =
      run(items, Pacer.Config(serverDelayMs = 100))
    assert(drained.isEmpty)
    assert(fetched.map(_._1) == Vector("a1", "a2", "a3"))
    val times = fetched.map(_._2)
    assert(times.sliding(2).forall { case Seq(x, y) => y - x >= 100 })
  }

  test("hosts interleave instead of queueing behind each other") {
    val items =
      (1 to 3).map(i => Pacer.Item("a.com", s"a$i")) ++
        (1 to 3).map(i => Pacer.Item("b.com", s"b$i"))
    val (fetched, _) = run(items, Pacer.Config(serverDelayMs = 100))
    // with equal delays the two hosts alternate: at no point do we wait
    // on a while b is ready
    assert(fetched.map(_._1) ==
      Vector("a1", "b1", "a2", "b2", "a3", "b3"), fetched)
    // total wall time is one host's span, not the sum of both
    assert(fetched.last._2 == 200, fetched)
  }

  test("robots crawl-delay overrides server delay; metadata override wins") {
    val items = Seq(
      Pacer.Item("a.com", "a1", robotsDelayMs = Some(500)),
      Pacer.Item("a.com", "a2", robotsDelayMs = Some(500)),
      Pacer.Item("b.com", "b1", delayOverrideMs = Some(50),
        robotsDelayMs = Some(500)),
      Pacer.Item("b.com", "b2", delayOverrideMs = Some(50),
        robotsDelayMs = Some(500)))
    val (fetched, _) = run(items, Pacer.Config(serverDelayMs = 100))
    val byHost = fetched.groupBy(_._1.take(1)).view
      .mapValues(_.map(_._2)).toMap
    assert(byHost("a")(1) - byHost("a")(0) >= 500)
    assert(byHost("b")(1) - byHost("b")(0) >= 50)
    assert(byHost("b")(1) - byHost("b")(0) < 500)
  }

  test("a host with excessive robots crawl-delay is dropped whole") {
    val items = Seq(
      Pacer.Item("slow.com", "s1", robotsDelayMs = Some(60000)),
      Pacer.Item("slow.com", "s2", robotsDelayMs = Some(60000)),
      Pacer.Item("ok.com", "k1"))
    val (fetched, drained) =
      run(items, Pacer.Config(serverDelayMs = 10, maxCrawlDelayMs = 30000))
    assert(fetched.map(_._1) == Vector("k1"))
    assert(drained.toSet ==
      Set("s1" -> Pacer.ExcessCrawlDelay, "s2" -> Pacer.ExcessCrawlDelay))
  }

  test("time limit drains the remainder instead of overrunning") {
    val items = (1 to 100).map(i => Pacer.Item("a.com", s"a$i"))
    val (fetched, drained) =
      run(items, Pacer.Config(serverDelayMs = 100, timeLimitMs = 250))
    // t=0,100,200 fetch; next would be t=300 ≥ deadline 250
    assert(fetched.size == 3, fetched)
    assert(drained.size == 97)
    assert(drained.forall(_._2 == Pacer.TimeLimit))
  }

  test("max.crawl.delay drops only robots delays, never the generator override") {
    // a healthy host whose hostdb-driven variable delay exceeds the cap
    // must still be fetched (the cap targets hostile robots files only)
    val items = Seq(
      Pacer.Item("busy.com", "b1", delayOverrideMs = Some(60000)),
      Pacer.Item("busy.com", "b2", delayOverrideMs = Some(60000),
        robotsDelayMs = Some(90000)))
    val (fetched, drained) =
      run(items, Pacer.Config(serverDelayMs = 10, maxCrawlDelayMs = 30000))
    assert(drained.isEmpty)
    assert(fetched.map(_._1) == Vector("b1", "b2"))
    assert(fetched(1)._2 - fetched(0)._2 >= 60000) // override still paces
  }

  test("scales: 10k hosts x 10 items each, virtual time, sub-second") {
    val items = for (h <- 0 until 10000; i <- 0 until 10)
      yield Pacer.Item(s"h$h.com", s"h$h-$i")
    val t0 = System.nanoTime()
    val (fetched, drained) = run(items, Pacer.Config(serverDelayMs = 50))
    val wallMs = (System.nanoTime() - t0) / 1000000
    assert(fetched.size == 100000 && drained.isEmpty)
    // heap scheduling: linear-ish, not O(items * hosts)
    assert(wallMs < 5000, s"pacer took ${wallMs}ms")
    // virtual completion time = one host's paced span (interleaved)
    assert(fetched.map(_._2).max == 9 * 50)
  }

  test("throughput floor drains when the average sinks below it") {
    val items = (1 to 50).map(i => Pacer.Item("a.com", s"a$i"))
    val (fetched, drained) = run(items,
      Pacer.Config(serverDelayMs = 1000, throughputPagesPerSec = 5,
        throughputCheckAfterMs = 2000))
    // 1 page/sec < 5 pages/sec once the grace period passes
    assert(fetched.nonEmpty && drained.nonEmpty)
    assert(drained.forall(_._2 == Pacer.LowThroughput))
    assert(fetched.size + drained.size == 50)
  }
}
