package graft.ops

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** PartitionedLogWriter append mode + PartitionedLogReader consumer-
  * group semantics: offsets continue across appends, poll sees only
  * uncommitted records, commit is monotone per group and independent
  * across groups. */
class PartitionedLogSpec extends AnyFunSuite with SparkSuite {

  private def docs(urls: String*) = {
    import spark.implicits._
    urls.map(u => Index.Doc(u, "add", "t:" + u, "h", "c", "d", 1.0f, Nil))
      .toDS()
  }

  test("append continues offsets; poll/commit consume each batch once") {
    val out = Files.createTempDirectory("graft-klog").toString
    val w = new IndexWriters.PartitionedLogWriter(3, append = true)

    w.write(docs((1 to 20).map(i => s"http://a.com/$i"): _*), out)
    val r1 = IndexWriters.PartitionedLogReader
      .poll(spark, out, "g1").collect()
    assert(r1.length == 20)
    // offsets are dense per partition: 0..count-1
    r1.groupBy(_.getInt(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq ==
        (0L until rows.length.toLong))
    }
    // commit g1 to each partition's max+1
    val next1 = r1.groupBy(_.getInt(0)).view
      .mapValues(_.map(_.getLong(1)).max + 1).toMap
    IndexWriters.PartitionedLogReader.commit(out, "g1", next1)
    assert(IndexWriters.PartitionedLogReader
      .poll(spark, out, "g1").count() == 0)

    // append a second batch: offsets continue, only g1 sees them as new
    w.write(docs((21 to 30).map(i => s"http://a.com/$i"): _*), out)
    val r2 = IndexWriters.PartitionedLogReader
      .poll(spark, out, "g1").collect()
    assert(r2.length == 10)
    // every new record's offset continues past the committed floor
    r2.foreach(r => assert(r.getLong(1) >= next1(r.getInt(0))))
    // an uncommitted group still sees the full topic
    assert(IndexWriters.PartitionedLogReader
      .poll(spark, out, "g2").count() == 30)
    // keys/values survive the round trip
    assert(r2.map(_.getString(2)).toSet ==
      (21 to 30).map(i => s"http://a.com/$i").toSet)
    assert(r2.forall(r => r.getString(3).contains("\"title\":\"t:" +
      r.getString(2) + "\"")))
  }

  test("streaming tail: each appended batch arrives as new micro-batch rows") {
    val out = Files.createTempDirectory("graft-klog-stream").toString
    val w = new IndexWriters.PartitionedLogWriter(2, append = true)
    w.write(docs("http://s.com/1", "http://s.com/2", "http://s.com/3"), out)

    val q = IndexWriters.PartitionedLogReader.stream(spark, out)
      .writeStream.format("memory").queryName("klog_tail")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("klog_tail").count() == 3)
      // producer rolls a new segment; the file source discovers it
      w.write(docs("http://s.com/4", "http://s.com/5"), out)
      q.processAllAvailable()
      val rows = spark.table("klog_tail").collect()
      assert(rows.length == 5)
      assert(rows.map(_.getString(2)).toSet ==
        (1 to 5).map(i => s"http://s.com/$i").toSet)
      // offsets are monotone per partition across the stream
      rows.groupBy(_.getInt(0)).foreach { case (_, rs) =>
        val offs = rs.map(_.getLong(1)).sorted.toSeq
        assert(offs == (0L until rs.length.toLong), offs)
      }
    } finally q.stop()
  }

  test("non-append write resets the topic and its offsets") {
    val out = Files.createTempDirectory("graft-klog2").toString
    val appender = new IndexWriters.PartitionedLogWriter(2, append = true)
    appender.write(docs("http://x.com/1", "http://x.com/2"), out)
    appender.write(docs("http://x.com/3"), out)
    val wiped = new IndexWriters.PartitionedLogWriter(2)
    wiped.write(docs("http://x.com/9"), out)
    val all = IndexWriters.PartitionedLogReader.read(spark, out).collect()
    assert(all.length == 1 && all.head.getLong(1) == 0L &&
      all.head.getString(2) == "http://x.com/9")
  }
}
