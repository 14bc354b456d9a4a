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
    * advanced, so the regenerated fetchlist differs); deployments pass
    * `checkpoint`, which keys rounds to the checkpointed trigger — a
    * COMMITTED micro-batch is never re-issued, even by a brand-new
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
          Crawl.round(spark, root, stores, r, protocol, registry, cfg)
          onRound(r)
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
