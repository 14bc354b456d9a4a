package graft.service

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** §3.3 REST surface: /admin, async /job/create + /job/{id}, /db/crawldb
  * stats and point lookup — driven over real HTTP. */
class RestServerSpec extends AnyFunSuite with SparkSuite {

  private lazy val client = HttpClient.newHttpClient()

  private def get(url: String): (Int, String) = {
    val r = client.send(HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  private def post(url: String): (Int, String) = {
    val r = client.send(HttpRequest.newBuilder(URI.create(url))
      .POST(HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  private def awaitJob(base: String, id: String): String = {
    val deadline = System.currentTimeMillis() + 60000
    var state = "RUNNING"
    while (state == "RUNNING" && System.currentTimeMillis() < deadline) {
      val (_, body) = get(s"$base/job/$id")
      state = "\"state\":\"([A-Z]+)\"".r.findFirstMatchIn(body).get.group(1)
      if (state == "RUNNING") Thread.sleep(100)
    }
    state
  }

  test("admin, job lifecycle, db read endpoints") {
    val srv = RestServer.start(spark, port = 0)
    try {
      val base = s"http://localhost:${srv.port}"

      val (c0, admin) = get(s"$base/admin")
      assert(c0 == 200 && admin.contains("\"product\":\"graft\""))

      // inject via seedList, async
      val root = Files.createTempDirectory("rest").toString
      val (c1, created) = post(s"$base/job/create?type=inject" +
        s"&crawldb=$root/crawldb&seedList=http://r.example.com/" +
        s"&now=1700000000000")
      assert(c1 == 200, created)
      val id = "\"id\":(\\d+)".r.findFirstMatchIn(created).get.group(1)
      assert(awaitJob(base, id) == "FINISHED")

      // job listing shows it
      val (_, list) = get(s"$base/job")
      assert(list.contains(s""""id":$id"""))

      // db stats + point lookup
      val (c2, stats) = get(s"$base/db/crawldb?crawldb=$root/crawldb")
      assert(c2 == 200 && stats.contains("db_unfetched"), stats)
      val (c3, row) = get(s"$base/db/crawldb?crawldb=$root/crawldb" +
        "&url=http%3A%2F%2Fr.example.com%2F")
      assert(c3 == 200 && row.contains("\"status\":\"db_unfetched\""), row)
      val (c4, _) = get(s"$base/db/crawldb?crawldb=$root/crawldb&url=nope")
      assert(c4 == 404)

      // bad requests
      assert(post(s"$base/job/create")._1 == 400)
      assert(get(s"$base/job/99999")._1 == 404)
      // failed job surfaces FAILED state, not a hang
      val (_, bad) = post(s"$base/job/create?type=nosuch&crawldb=$root/x")
      val badId = "\"id\":(\\d+)".r.findFirstMatchIn(bad).get.group(1)
      assert(awaitJob(base, badId) == "FAILED")
    } finally srv.stop()
  }
}
