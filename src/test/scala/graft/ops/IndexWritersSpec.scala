package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

class IndexWritersSpec extends AnyFunSuite with SparkSuite {

  private def docs = {
    import spark.implicits._
    Seq(
      Index.Doc("http://a.com/", "add", "A", "a.com", "body a", "d1", 2.0f, Nil),
      Index.Doc("http://b.com/", "add", "B", "b.com", "body b", "d2", 0.5f, Nil),
      Index.Doc("http://c.com/", "delete", "", "c.com", "", "d3", 0f, Nil))
      .toDS()
  }

  test("exchange routing + json/csv writers") {
    import spark.implicits._
    val base = Files.createTempDirectory("writers").toString
    IndexWriters.routeAndWrite(
      docs,
      rules = Seq(
        "archive" -> (col("action") === "delete"),
        "live" -> (col("boost") >= 1.0f)),
      writers = Map(
        "archive" -> new IndexWriters.CsvWriter("archive"),
        "live" -> new IndexWriters.JsonLinesWriter("live"),
        "default" -> new IndexWriters.JsonLinesWriter("default")),
      default = "default",
      baseDir = base)

    val live = spark.read.text(s"$base/live").as[String].collect()
    assert(live.length == 1 && live.head.contains("\"url\":\"http://a.com/\""))
    val dflt = spark.read.text(s"$base/default").as[String].collect()
    assert(dflt.length == 1 && dflt.head.contains("http://b.com/"))
    val archive = spark.read.option("header", "true").csv(s"$base/archive")
    assert(archive.count() == 1)
    assert(archive.select("action").head().getString(0) == "delete")
  }
}
