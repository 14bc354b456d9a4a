package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** The events family is the one surface whose INPUT physical type has
  * drifted under the repo (driver testdata shipped events.ts first as
  * parquet TIMESTAMP(NANOS), later as timestamp[us]). These tests pin
  * the two guarantees the r8 regression exposed:
  *
  *   1. `Tables.apply` normalizes every physical encoding of events.ts
  *      — raw int64 nanoseconds, TIMESTAMP_NTZ(µs), TIMESTAMP(µs) —
  *      to ONE contract: Long nanoseconds since epoch, exactly.
  *   2. The event-time queries (events_hourly / sessionize /
  *      dedup_stream_batch / sliding_rate) implement their documented
  *      semantics on ADVERSARIAL event sets: equal timestamps
  *      (tiebreak by event_id), gaps exactly AT the 30-minute session
  *      boundary (strict >: 1800000000 µs is the SAME session),
  *      duplicate signatures across users, and hour/slot edges —
  *      verified row-exactly against an independent plain-Scala model,
  *      the same discipline as DedupPropertiesSpec.
  */
object EventSemanticsSpec {
  // top-level so Spark can derive an Encoder (inner classes cannot)
  final case class Ev(event_id: Long, ts_us: Long, user_id: Long,
      event_type: String, value: Double, props: String)
}

class EventSemanticsSpec extends AnyFunSuite with SparkSuite {
  import EventSemanticsSpec.Ev

  /** Write events rows with `ts` in the given physical encoding and
    * return the table dir Tables.apply should read. */
  private def writeEvents(rows: Seq[Ev], encoding: String): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_events_").toString
    val base = rows.toDS().toDF()
    val withTs = encoding match {
      case "long_ns" => base.withColumn("ts", col("ts_us") * 1000L)
      case "ntz_us" => base.withColumn("ts", expr(
        "timestampadd(MICROSECOND, ts_us, TIMESTAMP_NTZ'1970-01-01 00:00:00')"))
      case "ltz_us" => base.withColumn("ts", timestamp_micros(col("ts_us")))
    }
    withTs.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("Tables.apply normalizes all three ts encodings to ns Long") {
    val rows = Seq(
      Ev(1L, 0L, 1L, "a", 1.0, "{}"), // epoch itself
      Ev(2L, 1721930400123456L, 2L, "b", 2.0, "{}"), // 2024, µs precision
      Ev(3L, 3600000000L, 1L, "a", 0.25, "{}")) // exactly 1h
    for (enc <- Seq("long_ns", "ntz_us", "ltz_us")) {
      val dir = writeEvents(rows, enc)
      val got = Tables(spark, dir, "events")
      assert(got.schema("ts").dataType ==
        org.apache.spark.sql.types.LongType, s"enc=$enc")
      val byId = got.select("event_id", "ts").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      rows.foreach { e =>
        assert(byId(e.event_id) == e.ts_us * 1000L,
          s"enc=$enc event=${e.event_id}")
      }
    }
  }

  // ---- generators --------------------------------------------------

  private val HourUs = 3600000000L
  private val GapUs = 1800000000L // the 30-minute session threshold

  /** Event sets concentrated in a few hours with planted edge shapes:
    * exact-boundary session gaps, equal-timestamp pairs, duplicate
    * dedup signatures, slot-edge timestamps. */
  private def eventsGen(n: Int): Gen[Seq[Ev]] = {
    val baseUs = 1700000000000000L // fixed corpus epoch
    val tsGen: Gen[Long] = Gen.frequency(
      5 -> Gen.choose(0L, 3L * HourUs),
      2 -> Gen.oneOf(0L, HourUs, 2 * HourUs, 300000000L, 599999999L),
      1 -> Gen.oneOf(0L, 1L).map(d => HourUs - d)) // hour-edge ±1µs
    val valueGen: Gen[Double] = Gen.frequency(
      4 -> Gen.choose(0, 400).map(_ / 4.0), // exact binary quarters
      1 -> Gen.oneOf(0.1, 1.23, 99.99))
    for {
      offs <- Gen.listOfN(n, tsGen)
      users <- Gen.listOfN(n, Gen.choose(1L, 6L))
      types <- Gen.listOfN(n, Gen.oneOf("view", "click", "buy"))
      values <- Gen.listOfN(n, valueGen)
    } yield {
      val random = offs.lazyZip(users).lazyZip(types).lazyZip(values)
        .toList.zipWithIndex.map { case ((off, u, t, v), i) =>
          Ev(i + 1L, baseUs + off, u, t, v, s"""{"k":$i}""")
        }
      val m = random.length.toLong
      // planted: user 9 with a gap EXACTLY at, and 1µs past, the
      // session threshold; two equal-timestamp events (id tiebreak);
      // an exact duplicate signature at a later time
      val planted = Seq(
        Ev(m + 1, baseUs, 9L, "view", 1.0, "{}"),
        Ev(m + 2, baseUs + GapUs, 9L, "view", 2.0, "{}"), // same session
        Ev(m + 3, baseUs + 2 * GapUs + 1, 9L, "view", 3.0, "{}"), // new
        Ev(m + 4, baseUs + 7L, 9L, "click", 1.25, "{}"),
        Ev(m + 5, baseUs + 7L, 9L, "click", 1.25, "{}"), // equal ts+sig
        Ev(m + 6, baseUs + HourUs + 7L, 9L, "click", 1.25, "{}"))
      random ++ planted
    }
  }

  // ---- independent models ------------------------------------------

  private def cents(v: Double): Long =
    java.math.BigDecimal.valueOf(v * 100)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  private def fxSum(vs: Seq[Double]): Double = vs.map(cents).sum / 100.0

  private def modelHourly(evs: Seq[Ev]) =
    evs.groupBy(e => ((e.ts_us * 1000L / 3600000000000L) * 3600,
        e.event_type))
      .map { case ((hour, typ), g) =>
        (hour, typ, g.size.toLong, g.map(_.user_id).distinct.size.toLong,
          fxSum(g.map(_.value)), g.map(_.event_id).min)
      }.toSet

  private def modelSessionize(evs: Seq[Ev]) =
    evs.groupBy(_.user_id).flatMap { case (u, g) =>
      val sorted = g.sortBy(e => (e.ts_us, e.event_id))
      var idx = 0L
      var prev = Long.MinValue
      val tagged = sorted.map { e =>
        if (prev == Long.MinValue || e.ts_us - prev > GapUs) idx += 1
        prev = e.ts_us
        (e, idx)
      }
      tagged.groupBy(_._2).map { case (si, tg) =>
        val es = tg.map(_._1)
        (u, si, es.size.toLong, es.map(_.event_id).min,
          es.map(_.event_id).max, es.map(_.ts_us).max - es.map(_.ts_us).min,
          fxSum(es.map(_.value)))
      }
    }.toSet

  private def sig(e: Ev): String = s"${e.event_type}|${cents(e.value)}"

  private def modelDedup(evs: Seq[Ev]) =
    evs.groupBy(sig).map { case (s, g) =>
      val keep = g.minBy(e => (e.ts_us, e.event_id))
      (keep.event_id, s, keep.ts_us)
    }.toSet

  private def modelSliding(evs: Seq[Ev]) =
    (for { e <- evs; k <- 0 to 1 }
      yield ((e.ts_us * 1000L / 300000000000L - k) * 300, e))
      .groupBy { case (w, e) => (w, e.event_type) }
      .map { case ((w, typ), g) =>
        val es = g.map(_._2)
        (w, typ, es.size.toLong, es.map(_.user_id).distinct.size.toLong,
          es.map(_.event_id).min)
      }.toSet

  // ---- Spark vs model ----------------------------------------------

  private def run(name: String, dir: String): Array[org.apache.spark.sql.Row] =
    Queries.byName(name).build(spark, dir).collect()

  test("event-time queries match an independent model on random sets") {
    for (seed <- 1 to 4) {
      val evs = eventsGen(120)
        .apply(Gen.Parameters.default, Seed(seed.toLong)).get
      val dir = writeEvents(evs, "ntz_us") // the current testdata form
      val hourly = run("events_hourly", dir).map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getLong(5))).toSet
      assert(hourly == modelHourly(evs), s"events_hourly seed=$seed")
      val sess = run("sessionize", dir).map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getDouble(6))).toSet
      assert(sess == modelSessionize(evs), s"sessionize seed=$seed")
      val dedup = run("dedup_stream_batch", dir).map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(dedup == modelDedup(evs), s"dedup_stream_batch seed=$seed")
      val sliding = run("sliding_rate", dir).map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet
      assert(sliding == modelSliding(evs), s"sliding_rate seed=$seed")
    }
  }
}
