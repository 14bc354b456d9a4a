package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.{Crawl, Fetch}
import graft.plugins.Extensions
import graft.tables.Segment

/** SURVEY §7's continuous-crawl surface: the conductor's
  * generate → fetch → parse → updatedb → invertlinks → dedup round
  * driven by a Structured-Streaming trigger stream instead of a driver
  * for-loop.
  *
  * Each element of the `rounds` stream is a round number; every
  * micro-batch runs the SAME [[Crawl.round]] body the batch conductor
  * loops, against the SAME copy-on-write stores — so batch/stream
  * equivalence holds by construction and is asserted byte-for-byte in
  * StreamingCrawlSpec. `foreachBatch` is the sanctioned Structured
  * Streaming shape for this: the crawl frontier is a FEEDBACK cycle
  * (round r+1 generates from the crawldb round r installed), which no
  * single streaming plan can express — the stream contributes
  * triggering, checkpointable progress, and backpressure, while the
  * round body remains the oracle-tested batch algebra.
  *
  * At 100 TB this is the deployment shape for "crawl forever": a rate
  * or control-topic source ticks rounds; each micro-batch is a
  * bounded, restartable unit whose durability comes from the tables'
  * write-then-swap installs, so a crashed batch re-runs idempotently
  * (same round clock → same generate set → same installs). */
object StreamingCrawl {

  /** Round-done markers, `<root>/.rounds-done/r<N>`: written atomically
    * (tmp + ATOMIC_MOVE, the GENERATION-pointer discipline) right after
    * round N's installs land. They make "this round already ran on this
    * root" knowable across JVMs WITHOUT sharing a streaming checkpoint,
    * so a second `crawl -stream` invocation of the same root skips
    * installed rounds instead of re-running them against the advanced
    * db (or hanging on a resumed rate-source offset past nRounds). The
    * unmarked-but-installed window is the marker write itself —
    * milliseconds, versus the micro-batch commit lag the checkpoint
    * leaves. */
  private def markerDir(root: String) =
    java.nio.file.Paths.get(root, ".rounds-done")
  private def marker(root: String, r: Int) =
    markerDir(root).resolve(s"r$r")

  /** True when round r's installs landed on this root in some earlier
    * query (possibly another JVM). */
  def roundDone(root: String, r: Int): Boolean =
    java.nio.file.Files.exists(marker(root, r))

  private def markRoundDone(root: String, r: Int): Unit = {
    import java.nio.file.{Files, StandardCopyOption}
    Files.createDirectories(markerDir(root))
    val tmp = markerDir(root).resolve(
      s".r$r-${java.util.UUID.randomUUID().toString.take(8)}")
    Files.writeString(tmp, java.time.Instant.now().toString)
    Files.move(tmp, marker(root, r), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Start the micro-batch loop. `rounds` must be a STREAMING dataset
    * of round numbers (e.g. a MemoryStream in tests, a rate source —
    * `round = value + 1` — in deployment). Seeds are injected once,
    * before the stream starts. Rounds arriving within one micro-batch
    * run sequentially in ascending order, so batching granularity
    * cannot reorder the crawl. `onRound` fires after each round's
    * installs land (progress latch for callers that stop after N).
    *
    * Crash/redelivery contract: a round whose micro-batch died BEFORE
    * its updatedb install re-runs safely — the crawldb is still in the
    * previous round's state, so the re-run regenerates the same
    * fetchlist at the same round clock and every segment part is
    * rewritten whole (SaveMode.Overwrite); proven in
    * StreamingCrawlSpec's crash-recovery test. A round redelivered
    * AFTER its installs landed is NOT segment-idempotent (the db has
    * advanced, so the regenerated fetchlist differs) — two guards
    * cover it: the per-round done marker (above) makes such a tick a
    * no-op in ANY later query of the root, and deployments may also
    * pass `checkpoint`, keying rounds to the checkpointed trigger so
    * a COMMITTED micro-batch is never re-issued, even by a brand-new
    * JVM resuming the same checkpoint dir (StreamingCrawlSpec's
    * cross-session restart test drives exactly that: stop, new
    * session, resume, only the un-committed round runs). Re-injection
    * on restart is safe: inject is the idempotent NUTCH-1405 merge,
    * so existing datums win over re-offered seeds. */
  def start(spark: SparkSession, root: String, seeds: Seq[String],
      rounds: Dataset[Int], protocol: Fetch.Protocol,
      registry: Extensions.Registry, cfg: Crawl.Config,
      onRound: Int => Unit = _ => (),
      checkpoint: Option[String] = None): StreamingQuery = {
    val stores = Crawl.openStores(spark, root, cfg)
    Crawl.inject(spark, stores, seeds, registry, cfg)
    val writer = rounds.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Int], _: Long) =>
        // the per-batch tick set is tiny (round numbers, not data) —
        // collect is the control plane, never the corpus
        batch.collect().sorted.foreach { r =>
          // a round marked done installed in an EARLIER query of this
          // root — the db has advanced past it, so a redelivered tick
          // must skip, not re-run (onRound stays silent: this query
          // installed nothing for it)
          if (!roundDone(root, r)) {
            Crawl.round(spark, root, stores, r, protocol, registry, cfg)
            markRoundDone(root, r)
            onRound(r)
          }
        }
        ()
      }
    checkpoint.fold(writer)(c => writer.option("checkpointLocation", c))
      .start()
  }


  /** The batch conductor's post-loop pass (hostdb census + index) over
    * the segments the stream produced — call after stopping the query
    * to obtain the same Summary shape Crawl.run returns. Per-round
    * generated/fetched counts are rebuilt from the segments; db sizes
    * are only knowable per round if the caller recorded them in its
    * `onRound` callback (pass them via `dbSizes`; missing rounds
    * report -1). */
  def finish(spark: SparkSession, root: String, roundsRun: Seq[Int],
      cfg: Crawl.Config,
      dbSizes: Map[Int, Long] = Map.empty): Crawl.Summary = {
    val stores = Crawl.openStores(spark, root, cfg)
    val segments = roundsRun.map(r =>
      new Segment(spark, s"$root/segments/r$r"))
    val stats = roundsRun.zip(segments).map { case (r, seg) =>
      Crawl.RoundStats(r, seg.generate.count(),
        seg.fetch.filter(_.datum.status ==
          graft.schemas.CrawlStatus.FETCH_SUCCESS).count(),
        dbSizes.getOrElse(r, -1L))
    }
    Crawl.finish(spark, stores, segments, stats, cfg)
  }
}
