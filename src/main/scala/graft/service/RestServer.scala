package graft.service

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.{ConcurrentHashMap, Executors}
import java.util.concurrent.atomic.AtomicLong

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

import graft.ops._
import graft.tables.{CrawlDbTable, Segment}

/** §3.3 — the REST service surface (reference openapi.yaml:70-801:
  * /admin, /config CRUD, /job create/list/get, /db/crawldb, /seed
  * list/create, /reader paged sequence/link/node reads) over the
  * library ops, on the JDK's built-in HTTP server — zero extra
  * dependencies.
  *
  * Jobs run async on a small pool with RUNNING/FINISHED/FAILED states,
  * like the reference's JobManager; arguments arrive as query
  * parameters (the reference takes JSON bodies — same information,
  * no JSON parser needed). One process == one SparkSession, so job
  * concurrency is Spark's scheduler concern, not ours. */
object RestServer {

  final case class Job(id: Long, jobType: String, args: Map[String, String]) {
    @volatile var state: String = "RUNNING"
    @volatile var message: String = ""
  }

  final class Server private[service] (spark: SparkSession, http: HttpServer) {
    private val jobs = new ConcurrentHashMap[Long, Job]()
    private val nextId = new AtomicLong(1)
    private val pool = Executors.newFixedThreadPool(2)

    // /config store (openapi.yaml:129-288): id → mutable property map,
    // pre-seeded with "default" like the reference's ConfManager
    private val configs =
      new ConcurrentHashMap[String, ConcurrentHashMap[String, String]]()
    locally {
      val dflt = new ConcurrentHashMap[String, String]()
      dflt.put("http.agent.name", "graft")
      dflt.put("http.robots.agents", "graft,*")
      configs.put("default", dflt)
    }
    // /seed store (openapi.yaml:535-589): name → (dir path, urls)
    private val seedLists =
      new ConcurrentHashMap[String, (String, Seq[String])]()

    def port: Int = http.getAddress.getPort
    def stop(): Unit = { http.stop(0); pool.shutdownNow() }

    private def q(ex: HttpExchange): Map[String, String] = {
      val raw = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      raw.split('&').filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        java.net.URLDecoder.decode(k, "UTF-8") ->
          java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap
    }

    private def reply(ex: HttpExchange, code: Int, json: String): Unit = {
      val b = json.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(code, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    }

    private def replyText(ex: HttpExchange, code: Int, text: String): Unit = {
      val b = text.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "text/plain")
      ex.sendResponseHeaders(code, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    }

    private def replyEmpty(ex: HttpExchange, code: Int): Unit = {
      ex.sendResponseHeaders(code, -1)
      ex.close()
    }

    private def body(ex: HttpExchange): String =
      new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

    private def jobJson(j: Job): String =
      s"""{"id":${j.id},"type":${graft.Json.str(j.jobType)},"state":${graft.Json.str(j.state)},""" +
        s""""msg":${graft.Json.str(j.message)}}"""

    /** The job verbs — the REST twin of the CLI dispatch. */
    private def runJob(j: Job): Unit = {
      val a = j.args
      def crawldb = graft.tables.CrawlDbStore.open(spark, a("crawldb"))
      def now = a.get("now").map(_.toLong)
        .getOrElse(System.currentTimeMillis())
      val registry = graft.plugins.Extensions.Registry(
        urlFilters = Seq(graft.net.RegexUrlFilter.parse(Iterator("+."))))
      j.jobType match {
        case "INJECT" =>
          import spark.implicits._
          val seeds = a.get("seedFile")
            .map(f => spark.read.textFile(f))
            .getOrElse(a("seedList").split(",").toSeq.toDS())
          crawldb.install(Inject(crawldb.read(), seeds, Inject.Config(),
            registry.filterChain, now), s"rest-inject-${j.id}")
          j.message = s"db=${crawldb.read().count()}"
        case "GENERATE" =>
          val seg = new Segment(spark, a("segment"))
          seg.writeGenerate(Generate(crawldb.read(), Generate.Config(
            topN = a.get("topN").map(_.toLong).getOrElse(Long.MaxValue),
            curTime = now), registry.schedule))
          j.message = s"generated=${seg.generate.count()}"
        case "UPDATEDB" =>
          val seg = new Segment(spark, a("segment"))
          crawldb.install(graft.crawl.UpdateDb(
            crawldb.read().union(seg.fetch).union(seg.crawlParse), now,
            registry.schedule, registry.scoring), s"rest-updatedb-${j.id}")
          j.message = s"db=${crawldb.read().count()}"
        case "INVERTLINKS" =>
          val l = graft.tables.LinkDbStore.open(spark, a("linkdb"))
          val seg = new Segment(spark, a("segment"))
          l.install(InvertLinks(seg.parseData, l.read(),
            InvertLinks.Config()), s"rest-invertlinks-${j.id}")
          j.message = s"linkdb=${l.read().count()}"
        case "DEDUP" =>
          crawldb.install(Dedup(crawldb.read()), s"rest-dedup-${j.id}")
          j.message = "ok"
        case "UPDATEHOSTDB" =>
          val h = graft.tables.HostDbStore.open(spark, a("hostdb"))
          h.install(UpdateHostDb(crawldb.read(), h.read(), now),
            s"rest-hostdb-${j.id}")
          j.message = s"hosts=${h.read().count()}"
        case "FETCH" =>
          // site snapshot through the protocol seam (the CLI's -site)
          val seg = new Segment(spark, a("segment"))
          Fetch.toSegment(seg.generate,
            graft.Main.loadSite(spark, a("siteFile")), now, seg)
          j.message = s"fetched=${seg.fetch.count()}"
        case "PARSE" =>
          val seg = new Segment(spark, a("segment"))
          val p = Parse(seg.fetch, seg.content, Parse.Config(),
            registry.filterChain)
          seg.writeParseData(p.parseData)
          seg.writeParseText(p.parseText)
          seg.writeCrawlParse(p.crawlParse)
          j.message = s"parsed=${seg.parseData.count()}"
        case "INDEX" =>
          val l = graft.tables.LinkDbStore.open(spark, a("linkdb"))
          val seg = new Segment(spark, a("segment"))
          val docs = Index(crawldb.read(), seg.fetch, seg.parseData,
            seg.parseText, l.read(), Index.Config())
          new IndexWriters.JsonLinesWriter().write(docs, a("out"))
          j.message = s"indexed=${spark.read.text(a("out")).count()}"
        case "READDB" =>
          j.message = CrawlDbReader.stats(crawldb.read())
            .orderBy("status").collect()
            .map(r => r.mkString(":")).mkString(",")
        case other => throw new IllegalArgumentException(s"job type $other")
      }
    }

    private[service] def install(): Unit = {
      http.createContext("/admin", (ex: HttpExchange) =>
        reply(ex, 200,
          s"""{"product":"graft","startDate":0,"configuration":["default"]}"""))
      http.createContext("/job/create", (ex: HttpExchange) => {
        val params = q(ex)
        params.get("type") match {
          case None => reply(ex, 400, """{"error":"type required"}""")
          case Some(t) =>
            val j = Job(nextId.getAndIncrement(), t.toUpperCase, params)
            jobs.put(j.id, j)
            pool.submit(new Runnable {
              def run(): Unit =
                try { runJob(j); j.state = "FINISHED" }
                catch { case e: Throwable =>
                  j.state = "FAILED"
                  j.message = String.valueOf(e.getMessage)
                }
            })
            reply(ex, 200, jobJson(j))
        }
      })
      http.createContext("/job", (ex: HttpExchange) => {
        // /job (list) or /job/{id}
        val path = ex.getRequestURI.getPath.stripPrefix("/job")
        if (path.isEmpty || path == "/")
          reply(ex, 200, jobs.values.toArray.map {
            case j: Job => jobJson(j)
          }.mkString("[", ",", "]"))
        else scala.util.Try(path.stripPrefix("/").toLong).toOption
          .flatMap(id => Option(jobs.get(id))) match {
          case Some(j) => reply(ex, 200, jobJson(j))
          case None => reply(ex, 404, """{"error":"no such job"}""")
        }
      })
      // ---- /config CRUD (openapi.yaml:129-288) -------------------- //
      http.createContext("/config", (ex: HttpExchange) => {
        val segs = ex.getRequestURI.getPath.stripPrefix("/config")
          .split("/").filter(_.nonEmpty).toList
        (ex.getRequestMethod, segs) match {
          case ("GET", Nil) =>
            reply(ex, 200, configs.keySet().toArray.map {
              case k: String => graft.Json.str(k)
            }.sorted.mkString("[", ",", "]"))
          case ("POST", List("create")) =>
            val p = q(ex)
            p.get("configId") match {
              case None => reply(ex, 400, """{"error":"configId required"}""")
              case Some(id) =>
                val m = new ConcurrentHashMap[String, String]()
                (p - "configId").foreach { case (k, v) => m.put(k, v) }
                configs.put(id, m)
                replyText(ex, 200, id)
            }
          case ("GET", List(id)) => Option(configs.get(id)) match {
            case Some(m) =>
              reply(ex, 200, m.entrySet().toArray.map {
                case e: java.util.Map.Entry[_, _] =>
                  s"${graft.Json.str(e.getKey.toString)}:${graft.Json.str(e.getValue.toString)}"
              }.sorted.mkString("{", ",", "}"))
            case None => reply(ex, 404, """{"error":"no such config"}""")
          }
          case ("DELETE", List(id)) =>
            if (configs.remove(id) != null) replyEmpty(ex, 204)
            else reply(ex, 404, """{"error":"no such config"}""")
          case ("GET", List(id, prop)) =>
            Option(configs.get(id)).flatMap(m => Option(m.get(prop))) match {
              case Some(v) => replyText(ex, 200, v)
              case None => reply(ex, 404, """{"error":"no such property"}""")
            }
          case ("PUT", List(id, prop)) => Option(configs.get(id)) match {
            case Some(m) => m.put(prop, body(ex)); replyText(ex, 200, "")
            case None => reply(ex, 404, """{"error":"no such config"}""")
          }
          case _ => reply(ex, 404, """{"error":"bad config request"}""")
        }
      })

      // ---- /seed (openapi.yaml:535-589) --------------------------- //
      http.createContext("/seed", (ex: HttpExchange) => {
        val segs = ex.getRequestURI.getPath.stripPrefix("/seed")
          .split("/").filter(_.nonEmpty).toList
        (ex.getRequestMethod, segs) match {
          case ("POST", List("create")) =>
            val p = q(ex)
            (p.get("name"), p.get("urls")) match {
              case (Some(name), _) if !name.matches("[A-Za-z0-9._-]{1,64}") =>
                // a path separator in the name must be a 400, not an
                // unanswered exchange from createTempDirectory throwing
                reply(ex, 400, """{"error":"invalid seed list name"}""")
              case (Some(name), Some(urls)) =>
                try {
                  val list =
                    urls.split(",").map(_.trim).filter(_.nonEmpty).toSeq
                  val dir = java.nio.file.Files.createTempDirectory(
                    s"graft-seed-$name-")
                  java.nio.file.Files.writeString(dir.resolve("seeds.txt"),
                    list.mkString("", "\n", "\n"))
                  seedLists.put(name, (dir.toString, list))
                  replyText(ex, 200, dir.toString)
                } catch {
                  case e: Exception => reply(ex, 500,
                    s"""{"error":${graft.Json.str(String.valueOf(e.getMessage))}}""")
                }
              case _ =>
                reply(ex, 400, """{"error":"name and urls required"}""")
            }
          case ("GET", Nil) =>
            reply(ex, 200, seedLists.entrySet().toArray.map {
              case e: java.util.Map.Entry[_, _] =>
                val (path, urls) = e.getValue.asInstanceOf[(String, Seq[String])]
                s"${graft.Json.str(e.getKey.toString)}:{" +
                  s""""name":${graft.Json.str(e.getKey.toString)},""" +
                  s""""seedFilePath":${graft.Json.str(path)},""" +
                  s""""urls":${urls.map(graft.Json.str).mkString("[", ",", "]")}}"""
            }.sorted.mkString("{", ",", "}"))
          case _ => reply(ex, 404, """{"error":"bad seed request"}""")
        }
      })

      // ---- /reader paged table reads (openapi.yaml:590-773) ------- //
      // nrows/start/end page through a DETERMINISTIC ordering with
      // plan-side offset+limit — the driver only ever holds one page
      // (capped at 1000 rows); count=true returns text/plain like the
      // reference.
      def readerPage(ex: HttpExchange,
          df: org.apache.spark.sql.DataFrame): Unit = {
        val p = q(ex)
        if (p.get("count").contains("true")) replyText(ex, 200, df.count().toString)
        else {
          val start = p.get("start").map(_.toInt).getOrElse(0)
          val lim = math.max(0, Seq(
            p.get("end").map(_.toInt - start),
            p.get("nrows").map(_.toInt), Some(1000)).flatten.min)
          val rows = df.offset(start).limit(lim).toJSON.collect()
          reply(ex, 200, rows.mkString("[", ",", "]"))
        }
      }
      def withPath(ex: HttpExchange)(f: String => Unit): Unit =
        q(ex).get("path") match {
          case Some(path) => try f(path) catch {
            case e: Exception =>
              reply(ex, 500, s"""{"error":${graft.Json.str(
                String.valueOf(e.getMessage))}}""")
          }
          case None => reply(ex, 400, """{"error":"path required"}""")
        }
      import org.apache.spark.sql.functions.{col, explode}
      http.createContext("/reader/sequence/read", (ex: HttpExchange) =>
        withPath(ex) { path =>
          val df = spark.read.parquet(path)
          readerPage(ex, df.orderBy(df.columns.map(col).toSeq: _*))
        })
      http.createContext("/reader/link", (ex: HttpExchange) =>
        reply(ex, 200,
          """{"url":"string","fromUrl":"string","anchor":"string"}"""))
      http.createContext("/reader/link/read", (ex: HttpExchange) =>
        withPath(ex) { path =>
          readerPage(ex, graft.tables.LinkDbStore.open(spark, path).read().toDF()
            .select(col("url"), explode(col("inlinks")).as("il"))
            .select(col("url"), col("il.fromUrl").as("fromUrl"),
              col("il.anchor").as("anchor"))
            .orderBy("url", "fromUrl"))
        })
      http.createContext("/reader/node", (ex: HttpExchange) =>
        reply(ex, 200,
          """{"url":"string","status":"string","score":"number","fetchTime":"number"}"""))
      http.createContext("/reader/node/read", (ex: HttpExchange) =>
        withPath(ex) { path =>
          readerPage(ex, graft.tables.CrawlDbStore.open(spark, path).read().toDF()
            .select(col("url"),
              col("datum.status").cast("int").as("status"),
              col("datum.score").as("score"),
              col("datum.fetchTime").as("fetchTime"))
            .orderBy("url"))
        })

      // per-job counters from a crawl root's metrics table (the
      // NutchMetrics observability surface): summed across rounds, or
      // one round's raw rows with ?round=N
      http.createContext("/metrics", (ex: HttpExchange) => {
        val params = q(ex)
        params.get("dir") match {
          case None => reply(ex, 400, """{"error":"dir required"}""")
          case Some(dir) =>
            try {
              val t = new graft.ops.Metrics.Table(spark, dir)
              val rows = params.get("round") match {
                case Some(r) => t.read()
                  .where(col("round") === r.toInt)
                  .orderBy("job", "name")
                  .select(col("job"), col("name"), col("value"))
                case None => t.summary()
              }
              val body = rows.collect().map(r =>
                s"""{"job":${graft.Json.str(r.getString(0))},"name":${
                  graft.Json.str(r.getString(1))},"value":${r.getLong(2)}}""")
              reply(ex, 200, body.mkString("[", ",", "]"))
            } catch {
              case _: NumberFormatException =>
                reply(ex, 400, """{"error":"round must be an integer"}""")
              case e: Exception =>
                reply(ex, 500, s"""{"error":${graft.Json.str(
                  String.valueOf(e.getMessage))}}""")
            }
        }
      })

      http.createContext("/db/crawldb", (ex: HttpExchange) => {
        val params = q(ex)
        params.get("crawldb") match {
          case None => reply(ex, 400, """{"error":"crawldb required"}""")
          case Some(dir) =>
            val db = graft.tables.CrawlDbStore.open(spark, dir).read()
            params.get("url") match {
              case Some(u) => CrawlDbReader.url(db, u) match {
                case Some(r) => reply(ex, 200,
                  s"""{"url":${graft.Json.str(r.url)},"status":${graft.Json.str(
                    r.datum.statusName)},"score":${r.datum.score},""" +
                    s""""fetchTime":${r.datum.fetchTime}}""")
                case None => reply(ex, 404, """{"error":"not found"}""")
              }
              case None =>
                val rows = CrawlDbReader.stats(db).orderBy("status")
                  .collect().map(r =>
                    s"""{"status":${graft.Json.str(r.getString(0))},"cnt":${
                      r.getLong(1)}}""")
                reply(ex, 200, rows.mkString("[", ",", "]"))
            }
        }
      })
    }
  }

  /** Start on `port` (0 = ephemeral). */
  def start(spark: SparkSession, port: Int = 8081): Server = {
    val http = HttpServer.create(new InetSocketAddress(port), 0)
    http.setExecutor(Executors.newFixedThreadPool(4))
    val s = new Server(spark, http)
    s.install()
    http.start()
    s
  }
}
