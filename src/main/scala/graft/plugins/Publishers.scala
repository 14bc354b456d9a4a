package graft.plugins

import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}

import graft.Json

/** §2.9 Publisher extension point — crawl-progress event publishing
  * (NutchPublisher.java:30-45; plugin publish-rabbitmq,
  * RabbitMQPublisherImpl.java:34-105).
  *
  * The reference raises a [[FetchEvent]] at three fetch-lifecycle
  * points (FetcherThreadEvent.java:33-50: START before the protocol
  * call, END after it with the protocol status, REPORT at parse time
  * with title/content-type/score/fetch-time) and hands it to every
  * configured publisher, which serializes it to JSON and ships it to a
  * message broker (exchange + routing key + static headers).
  *
  * Spark mapping: publishers are created PER PARTITION from a
  * serializable [[Factory]] (broker channels are not serializable, and
  * one channel per task is exactly the reference's one-channel-per-
  * fetcher-thread shape), invoked inline from the fetch/parse
  * `mapPartitions` lambdas, and closed when the partition's iterator
  * drains. Publishing is fire-and-forget: a broker failure must not
  * fail the fetch task (the reference logs and continues —
  * RabbitMQPublisherImpl.publish catches everything), so implementations
  * swallow their own I/O errors.
  */
object Publishers {

  /** FetcherThreadEvent.PublishEventType. */
  object EventType {
    val Start = "START"
    val End = "END"
    val Report = "REPORT"
  }

  /** One fetch-lifecycle event (FetcherThreadEvent fields: type, url,
    * wall timestamp, free-form data map). */
  final case class FetchEvent(eventType: String, url: String,
      timestamp: Long, data: Map[String, String]) {

    /** The broker wire body — the bean-style JSON the reference's
      * ObjectMapper writes for FetcherThreadEvent (eventType/eventData/
      * url/timestamp). Data keys sorted so the body is deterministic. */
    def toJson: String = {
      val dataJson = data.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${Json.str(k)}:${Json.str(v)}" }
        .mkString("{", ",", "}")
      s"""{"eventType":${Json.str(eventType)},"eventData":$dataJson,""" +
        s""""url":${Json.str(url)},"timestamp":$timestamp}"""
    }
  }

  /** Per-partition publisher instance. NOT serializable — built on the
    * executor by a [[Factory]]. */
  trait Publisher extends AutoCloseable {
    def publish(e: FetchEvent): Unit
    def close(): Unit = ()
  }

  /** What crosses the closure boundary: a serializable constructor. */
  type Factory = () => Publisher

  /** Wraps `it` so `publisher.close()` fires exactly once when the
    * partition is done with it. Drain is the fast path, but drain
    * alone is NOT partition lifetime: a limit/take pushed into the
    * scan or a task abort consumes the iterator partially, which for
    * a buffering publisher (HttpPublisher batch) would silently drop
    * everything buffered. So when a task is live we also register a
    * TaskContext completion listener — Spark's actual end-of-partition
    * hook, which fires on success AND failure. */
  def closing[A](it: Iterator[A], p: Publisher): Iterator[A] = {
    val closeOnce = new java.util.concurrent.atomic.AtomicBoolean(false)
    def closeNow(): Unit =
      if (closeOnce.compareAndSet(false, true)) p.close()
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null) tc.addTaskCompletionListener[Unit](_ => closeNow())
    new Iterator[A] {
      def hasNext: Boolean = {
        val h = it.hasNext
        if (!h) closeNow()
        h
      }
      def next(): A = it.next()
    }
  }

  /** The publish-rabbitmq shape over the sandbox's reachable wire
    * (localhost HTTP): each batch of events is one POST of
    * newline-delimited [[FetchEvent.toJson]] bodies to
    * `endpoint/exchange`, carrying the routing key and the reference's
    * `key=value,key=value` static headers
    * (RabbitMQConstants ROUTING_KEY / HEADERS_STATIC) as request
    * headers. Batching amortizes the per-publish round trip the
    * reference pays per event on an open AMQP channel; `batchSize = 1`
    * restores per-event sends. Errors are swallowed after the
    * reference's publish contract. */
  final class HttpPublisher(endpoint: String, exchange: String,
      routingKey: String, staticHeaders: Map[String, String] = Map.empty,
      batchSize: Int = 50) extends Publisher {
    private val buf = new scala.collection.mutable.ArrayBuffer[String]
    def publish(e: FetchEvent): Unit = {
      buf += e.toJson
      if (buf.size >= batchSize) flush()
    }
    override def close(): Unit = flush()
    private def flush(): Unit = if (buf.nonEmpty) {
      val body = buf.mkString("\n")
      buf.clear()
      try {
        val conn = new java.net.URL(s"$endpoint/$exchange").openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        try {
          conn.setRequestMethod("POST")
          conn.setDoOutput(true)
          conn.setRequestProperty("Content-Type", "application/x-ndjson")
          conn.setRequestProperty("X-Routing-Key", routingKey)
          staticHeaders.foreach { case (k, v) => conn.setRequestProperty(k, v) }
          val bytes = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          conn.setFixedLengthStreamingMode(bytes.length)
          val out = conn.getOutputStream
          try out.write(bytes) finally out.close()
          conn.getResponseCode: Unit // drain; status intentionally unchecked
        } finally conn.disconnect()
      } catch { // fire-and-forget: a broker failure never fails the task
        case scala.util.control.NonFatal(_) => ()
      }
    }
  }

  object HttpPublisher {
    /** Parse the reference's `k1=v1,k2=v2` static-header config string
      * (RabbitMQConstants.HEADERS_STATIC). */
    def parseHeaders(s: String): Map[String, String] =
      s.split(',').iterator.map(_.trim).filter(_.nonEmpty)
        .flatMap { kv =>
          kv.split("=", 2) match {
            case Array(k, v) => Some(k.trim -> v.trim)
            case _ => None
          }
        }.toMap
  }

  /** File-log publisher: the streaming-observability seam. Each
    * publisher instance (= one fetch/parse task) buffers its events and
    * seals ONE segment file of [[FetchEvent.toJson]] lines on close —
    * written to a temp name and atomically moved, because Structured
    * Streaming file sources discover whole files (a partially-written
    * segment must never be visible). The segment-per-task shape is the
    * same rolled-segment discipline as PartitionedLogWriter, and
    * [[graft.streaming.MetricsStream]] tails the directory into
    * windowed fetch counters. */
  final class FileLogPublisher(dir: String) extends Publisher {
    private val buf = new scala.collection.mutable.ArrayBuffer[String]
    def publish(e: FetchEvent): Unit = buf += e.toJson
    override def close(): Unit = if (buf.nonEmpty) {
      val d = java.nio.file.Paths.get(dir)
      java.nio.file.Files.createDirectories(d)
      val name = s"events-${java.util.UUID.randomUUID()}"
      val tmp = d.resolve(s".$name.tmp")
      java.nio.file.Files.writeString(tmp, buf.mkString("", "\n", "\n"))
      java.nio.file.Files.move(tmp, d.resolve(s"$name.log"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      buf.clear()
    }
  }

  /** Test publisher: events land in a JVM-wide queue under `id`.
    * local-mode executors share the JVM, so a spec can assert the exact
    * event stream a fetch emitted. */
  final class CollectingPublisher(id: String) extends Publisher {
    def publish(e: FetchEvent): Unit = Collected.queue(id).add(e)
  }

  object Collected {
    private val all = new ConcurrentHashMap[String, ConcurrentLinkedQueue[FetchEvent]]
    private[Publishers] def queue(id: String): ConcurrentLinkedQueue[FetchEvent] =
      all.computeIfAbsent(id, _ => new ConcurrentLinkedQueue[FetchEvent])
    def drain(id: String): Seq[FetchEvent] = {
      val q = queue(id)
      Iterator.continually(q.poll()).takeWhile(_ != null).toVector
    }
  }
}
