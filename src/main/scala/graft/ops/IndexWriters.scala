package graft.ops

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Dataset, SaveMode}
import org.apache.spark.sql.functions._

/** S7/S8 — index-writer sinks and the exchange router
  * (indexer-* plugin family; Exchanges.java / exchange-jexl routing).
  *
  * `IndexWriter` is the §2.9 extension-point seam; the two concrete
  * writers cover the text-format family (JSON-lines for the
  * elasticsearch/solr document shape, CSV for the csv indexer plugin).
  * Routing is declarative: first-match rules compile into one CASE
  * column, then a partitioned write fans docs out by target — one pass,
  * no per-writer rescans. */
object IndexWriters {

  /** §2.9 extension point: a destination for indexed documents. */
  trait IndexWriter extends Serializable {
    def name: String
    def write(docs: Dataset[Index.Doc], outDir: String): Unit
  }

  /** indexer-elastic/solr document shape as JSON lines. */
  final class JsonLinesWriter(val name: String = "jsonlines")
      extends IndexWriter {
    def write(docs: Dataset[Index.Doc], outDir: String): Unit =
      docs.toDF()
        .select(to_json(struct(col("url"), col("action"), col("title"),
          col("host"), col("digest"), col("boost"))).as("value"))
        .write.mode(SaveMode.Overwrite).text(outDir)
  }

  /** indexer-csv shape. */
  final class CsvWriter(val name: String = "csv") extends IndexWriter {
    def write(docs: Dataset[Index.Doc], outDir: String): Unit =
      docs.toDF()
        .select(col("url"), col("action"), col("title"), col("host"),
          col("digest"), col("boost"))
        .write.mode(SaveMode.Overwrite).option("header", "true").csv(outDir)
  }

  /** S7 live-sink analog — indexer-solr/indexer-elastic over HTTP
    * (SolrIndexWriter.java:118-230 write/delete/commit flow,
    * IndexWriters.java:354): every partition POSTs JSON-lines bulk
    * batches to `<endpoint>/update`, then ONE driver-side
    * `<endpoint>/commit` seals the job — the same batch+commit protocol
    * the reference drives through SolrClient, expressed as plain HTTP
    * so it runs against any localhost fixture (no egress in this
    * sandbox; a live Solr/ES URL drops in unchanged).
    *
    * Bulk lines are the JsonLinesWriter document shape; `action` is
    * "add" or "delete" (NutchIndexAction), so CleaningJob's
    * deleteActions stream drives deletions through the same writer.
    * JSON is built on the plan (codegen'd to_json) — executors ship
    * strings, never Row objects; non-2xx responses throw so the Spark
    * task fails and retries rather than dropping documents. */
  final class HttpBulkWriter(val endpoint: String, val batchSize: Int = 250,
      val name: String = "http") extends IndexWriter {
    def write(docs: Dataset[Index.Doc], outDir: String): Unit = {
      import docs.sparkSession.implicits._
      val lines = docs.toDF()
        .select(to_json(struct(col("url"), col("action"), col("title"),
          col("host"), col("digest"), col("boost"))).as("value"))
        .as[String]
      val (ep, bs) = (endpoint, batchSize)
      lines.foreachPartition { (it: Iterator[String]) =>
        it.grouped(bs).foreach(batch =>
          HttpBulkWriter.post(s"$ep/update", batch.mkString("\n")))
      }
      HttpBulkWriter.post(s"$endpoint/commit", "")
    }
  }

  object HttpBulkWriter {
    /** Minimal POST; returns the status code, throws on non-2xx. */
    private[graft] def post(url: String, body: String,
        contentType: String = "application/json"): Int = {
      val conn = new java.net.URL(url).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      try {
        conn.setRequestMethod("POST")
        conn.setDoOutput(true)
        conn.setRequestProperty("Content-Type", contentType)
        val bytes = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        conn.setFixedLengthStreamingMode(bytes.length)
        val out = conn.getOutputStream
        try out.write(bytes) finally out.close()
        val code = conn.getResponseCode
        if (code < 200 || code >= 300)
          throw new java.io.IOException(s"POST $url -> HTTP $code")
        code
      } finally conn.disconnect()
    }
  }

  // -------------------------------------------------------------------------
  // S7 engine-specific sink dialects
  // -------------------------------------------------------------------------

  /** Frames doc batches into an engine's bulk wire format. Adds and
    * deletes arrive pre-split because Solr's XML update message allows
    * one root element per request (SolrIndexWriter.java buffers
    * inputDocs and deleteIds separately and flushes each on its own);
    * dialects that can mix (ES `_bulk`) emit a single body. */
  trait BulkDialect extends Serializable {
    def name: String
    def updatePath: String
    def contentType: String
    /** One or more request bodies for the batch, in send order. */
    def frame(adds: Seq[Index.Doc], deleteIds: Seq[String]): Seq[String]
    /** (path, body) of the job-sealing commit request, if the engine
      * has one. */
    def commit: Option[(String, String)]
  }

  /** indexer-solr dialect: the classic XML update message
    * (SolrIndexWriter.java:118-230 write/delete flow as wire XML —
    * `<add><doc><field name=…>` documents, `<delete><id>` tombstones,
    * `<commit/>` to seal). */
  final class SolrXmlDialect extends BulkDialect {
    val name = "solr"
    val updatePath = "/update"
    val contentType = "text/xml"

    private def esc(s: String): String = {
      val sb = new StringBuilder(s.length)
      s.foreach {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case '"' => sb.append("&quot;")
        case '\'' => sb.append("&apos;")
        case c => sb.append(c)
      }
      sb.toString
    }

    private def field(n: String, v: String): String =
      s"""<field name="$n">${esc(v)}</field>"""

    def frame(adds: Seq[Index.Doc], deleteIds: Seq[String]): Seq[String] = {
      val addBody =
        if (adds.isEmpty) None
        else Some(adds.map(d =>
          "<doc>" + field("id", d.url) + field("title", d.title) +
            field("host", d.host) + field("digest", d.digest) +
            field("boost", d.boost.toString) + "</doc>")
          .mkString("<add>", "", "</add>"))
      val delBody =
        if (deleteIds.isEmpty) None
        else Some(deleteIds.map(id => s"<id>${esc(id)}</id>")
          .mkString("<delete>", "", "</delete>"))
      addBody.toSeq ++ delBody.toSeq
    }

    def commit: Option[(String, String)] = Some(("/update", "<commit/>"))
  }

  /** indexer-elastic dialect: `_bulk` action-and-metadata framing —
    * `{"index":{"_id":…}}` + source line per add, `{"delete":{"_id":…}}`
    * per tombstone, newline-terminated ndjson body, `/_refresh` as the
    * commit analog (ElasticIndexWriter's BulkProcessor wire format). */
  final class EsBulkDialect extends BulkDialect {
    val name = "elastic"
    val updatePath = "/_bulk"
    val contentType = "application/x-ndjson"

    private def j(s: String): String = graft.Json.str(s)

    def frame(adds: Seq[Index.Doc], deleteIds: Seq[String]): Seq[String] = {
      if (adds.isEmpty && deleteIds.isEmpty) return Nil
      val sb = new StringBuilder
      adds.foreach { d =>
        sb.append(s"""{"index":{"_id":${j(d.url)}}}""").append('\n')
        sb.append(s"""{"url":${j(d.url)},"title":${j(d.title)},""" +
          s""""host":${j(d.host)},"digest":${j(d.digest)},""" +
          s""""boost":${d.boost}}""").append('\n')
      }
      deleteIds.foreach(id =>
        sb.append(s"""{"delete":{"_id":${j(id)}}}""").append('\n'))
      Seq(sb.toString)
    }

    def commit: Option[(String, String)] = Some(("/_refresh", ""))
  }

  /** HttpBulkWriter generalized over a [[BulkDialect]]: same per-
    * partition batch+POST shape, same non-2xx → task-retry contract,
    * engine-specific body framing. The delete flow (CleaningJob
    * deleteActions) rides the `action` column into the dialect's
    * tombstone form. */
  final class DialectBulkWriter(val endpoint: String,
      val dialect: BulkDialect, val batchSize: Int = 250)
      extends IndexWriter {
    def name: String = dialect.name
    def write(docs: Dataset[Index.Doc], outDir: String): Unit = {
      val (ep, d, bs) = (endpoint, dialect, batchSize)
      docs.foreachPartition { (it: Iterator[Index.Doc]) =>
        it.grouped(bs).foreach { batch =>
          val (dels, adds) = batch.partition(_.action == "delete")
          d.frame(adds, dels.map(_.url))
            .foreach(body =>
              HttpBulkWriter.post(ep + d.updatePath, body, d.contentType))
        }
      }
      dialect.commit.foreach { case (path, body) =>
        HttpBulkWriter.post(endpoint + path, body, dialect.contentType)
      }
    }
  }

  /** indexer-kafka analog (indexer-kafka/.../KafkaIndexWriter.java
    * produce loop), brokerless: a keyed partitioned APPEND LOG stored
    * the way a broker stores it — per-partition directories of rolled
    * SEGMENT files named by base offset
    * (`partition-<p>/<baseOffset%020d>.log`), each an ordered file of
    * `offset \t key \t json` lines with per-partition monotone
    * offsets. Records route to `hash(url) mod N` log-partitions (the
    * producer's default key partitioner); `repartition(N, part)` gives
    * every log-partition exactly one Spark task (the partition affinity
    * a producer gives a broker partition), so offsets need no
    * cross-task coordination; records are sorted (part, key) within
    * the task so offsets are deterministic — a documented divergence
    * from a live producer's arrival order. Each write batch rolls one
    * new segment per non-empty partition, which is what lets Spark's
    * file STREAMING source tail the topic (new segment files are the
    * discoverable units — [[PartitionedLogReader.stream]]).
    *
    * Delivery on task retry is at-least-once (a retried task rewrites
    * its segment files; the next-offset sidecar only advances at seal),
    * matching a non-idempotent producer. */
  final class PartitionedLogWriter(val partitions: Int,
      val name: String = "kafkalog",
      // append=true continues each log-partition from its stored next
      // offset (the producer-across-jobs shape); false wipes the topic
      val append: Boolean = false) extends IndexWriter {
    def write(docs: Dataset[Index.Doc], outDir: String): Unit = {
      val spark = docs.sparkSession
      import spark.implicits._
      val n = partitions
      val appnd = append
      val out = java.nio.file.Paths.get(outDir)
      if (!appnd && java.nio.file.Files.exists(out))
        graft.tables.Install.deleteRecursively(out)
      java.nio.file.Files.createDirectories(out)
      docs.toDF()
        .withColumn("value", to_json(struct(col("url"), col("action"),
          col("title"), col("host"), col("digest"), col("boost"))))
        .withColumn("part", pmod(hash(col("url")), lit(n)))
        .repartition(n, col("part"))
        .sortWithinPartitions("part", "url")
        .select(col("part"), col("url").as("key"), col("value"))
        .as[(Int, String, String)]
        .foreachPartition { (it: Iterator[(Int, String, String)]) =>
          var cur = -1
          var w: java.io.PrintWriter = null
          var off = 0L
          def seal(): Unit = if (w != null) {
            w.close()
            // next-offset sidecar: O(1) append resumption — no segment
            // listing or tail scan to find where offsets left off
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(
                s"$outDir/partition-$cur/next-offset"),
              off.toString)
          }
          it.foreach { case (p, k, v) =>
            if (p != cur) {
              seal()
              cur = p
              val pdir = java.nio.file.Paths.get(s"$outDir/partition-$p")
              java.nio.file.Files.createDirectories(pdir)
              val sidecar = pdir.resolve("next-offset")
              off =
                if (appnd && java.nio.file.Files.exists(sidecar))
                  java.nio.file.Files.readString(sidecar).trim.toLong
                else 0L
              // roll a fresh segment at this batch's base offset
              w = new java.io.PrintWriter(new java.io.FileWriter(
                s"$outDir/partition-$p/${"%020d".format(off)}.log", false))
            }
            w.println(s"$off\t$k\t$v"); off += 1
          }
          seal()
        }
    }
  }

  /** Consumer side of [[PartitionedLogWriter]]'s log — the
    * consumer-group batch semantics a Kafka reader gives: `read` parses
    * the whole topic, `poll(group)` returns only records past the
    * group's committed offsets, `commit(group)` advances them.
    * Committed state is one tiny `offsets-<group>.tsv` of
    * `partition \t nextOffset` — the "__consumer_offsets" analog, small
    * enough to broadcast into the poll filter. */
  object PartitionedLogReader {

    /** `offset \t key \t json` lines → (part, offset, key, value);
      * the partition comes from the segment's directory name. */
    private def parse(lines: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame =
      lines
        .withColumn("part", regexp_extract(
          input_file_name(), "partition-(\\d+)/", 1).cast("int"))
        .withColumn("f", split(col("value"), "\t", 3))
        .select(col("part"), col("f").getItem(0).cast("long").as("offset"),
          col("f").getItem(1).as("key"), col("f").getItem(2).as("value"))

    private def segmentGlob(dir: String) = s"$dir/partition-*/*.log"

    /** Whole topic as (part, offset, key, value) — offsets as written,
      * one task per segment file. */
    def read(spark: org.apache.spark.sql.SparkSession, dir: String)
        : org.apache.spark.sql.DataFrame =
      parse(spark.read.text(segmentGlob(dir)))

    /** Structured-Streaming tail of the topic: every segment file a
      * producer rolls is one discoverable unit for the file source, so
      * each write batch arrives as (part, offset, key, value) rows in a
      * micro-batch — the consumer-poll loop as a stream. (File sources
      * track FILES, which is exactly why the writer rolls segments
      * instead of appending in place — an in-place append would be
      * invisible to the stream.) */
    def stream(spark: org.apache.spark.sql.SparkSession, dir: String)
        : org.apache.spark.sql.DataFrame =
      parse(spark.readStream.text(segmentGlob(dir)))

    private def offsetsFile(dir: String, group: String) =
      java.nio.file.Paths.get(s"$dir/offsets-$group.tsv")

    /** The group's committed next-offset per partition (empty map =
      * consume from the beginning). */
    def committed(dir: String, group: String): Map[Int, Long] = {
      val f = offsetsFile(dir, group)
      if (!java.nio.file.Files.exists(f)) Map.empty
      else java.nio.file.Files.readAllLines(f).asScala
        .filter(_.nonEmpty)
        .map { l => val a = l.split("\t"); a(0).toInt -> a(1).toLong }
        .toMap
    }

    /** Records the group has not yet consumed. The committed map rides
      * the filter as a literal map_filter-free CASE chain — partitions
      * number in the dozens, not millions. */
    def poll(spark: org.apache.spark.sql.SparkSession, dir: String,
        group: String): org.apache.spark.sql.DataFrame = {
      val next = committed(dir, group)
      val base = read(spark, dir)
      if (next.isEmpty) base
      else {
        val floor = next.foldLeft(lit(0L)) { case (acc, (p, o)) =>
          when(col("part") === p, lit(o)).otherwise(acc)
        }
        base.filter(col("offset") >= floor)
      }
    }

    /** Advance the group to `upToNext` (merged over prior commits),
      * atomically (temp file + move). */
    def commit(dir: String, group: String, upToNext: Map[Int, Long]): Unit = {
      val merged = committed(dir, group) ++ upToNext
      val tmp = java.nio.file.Files.createTempFile(
        java.nio.file.Paths.get(dir), s".offsets-$group", ".tmp")
      java.nio.file.Files.writeString(tmp,
        merged.toSeq.sorted.map { case (p, o) => s"$p\t$o" }
          .mkString("", "\n", "\n"))
      java.nio.file.Files.move(tmp, offsetsFile(dir, group),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** First-match routing rules: (writerName, predicate column). */
  def routeColumn(rules: Seq[(String, org.apache.spark.sql.Column)],
      default: String): org.apache.spark.sql.Column =
    rules.reverse.foldLeft(lit(default)) { case (acc, (w, p)) =>
      when(p, lit(w)).otherwise(acc)
    }

  /** Route and write: docs fan out to each writer's directory under
    * `baseDir/<writerName>`. */
  def routeAndWrite(docs: Dataset[Index.Doc],
      rules: Seq[(String, org.apache.spark.sql.Column)],
      writers: Map[String, IndexWriter], default: String,
      baseDir: String): Unit = {
    import docs.sparkSession.implicits._
    val routed = docs.toDF()
      .withColumn("__writer", routeColumn(rules, default))
      .cache()
    writers.foreach { case (wname, writer) =>
      val part = routed.filter(col("__writer") === wname)
        .drop("__writer").as[Index.Doc]
      writer.write(part, s"$baseDir/$wname")
    }
    routed.unpersist()
  }
}
