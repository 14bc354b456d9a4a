package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** BoundedSortedList: byte-exact equality with the
  * collect_list-sort-slice form it replaces, O(k) buffer state, and the
  * partial-aggregation plan shape that makes a hot key safe at scale. */
class BoundedTopKSpec extends AnyFunSuite with SparkSuite {

  test("equals slice(array_sort(collect_list)) incl. a hot key") {
    import spark.implicits._
    // key 0 is hot (10k rows); values arrive in adversarial (desc) order
    val rows = (0 until 10000).map(i => (0L, (10000 - i).toLong)) ++
      (1 to 50).flatMap(g => (0 until (g % 7) + 1).map(i =>
        (g.toLong, ((i * 37 + g) % 100).toLong)))
    val df = rows.toDF("key", "v").repartition(8)

    val viaAgg = df.groupBy("key")
      .agg(BoundedTopK.boundedSortedList(col("v"), 5).as("topk"))
    val viaCollect = df.groupBy("key")
      .agg(slice(array_sort(collect_list(col("v"))), 1, 5).as("topk"))

    val a = viaAgg.orderBy("key").collect().map(r =>
      (r.getLong(0), r.getSeq[Long](1)))
    val b = viaCollect.orderBy("key").collect().map(r =>
      (r.getLong(0), r.getSeq[Long](1)))
    assert(a.sameElements(b))
    assert(a.head == ((0L, Seq(1L, 2L, 3L, 4L, 5L))))
  }

  test("struct elements order field-wise (the InvertLinks shape)") {
    import spark.implicits._
    val df = Seq(
      ("u", "b.com", "z"), ("u", "a.com", "y"), ("u", "a.com", "x"),
      ("u", "c.com", "w"), ("v", "d.com", "q"))
      .toDF("url", "fromUrl", "anchor")
    val got = df.groupBy("url")
      .agg(BoundedTopK.boundedSortedList(
        struct(col("fromUrl"), col("anchor")), 3).as("inlinks"))
      .orderBy("url")
      .collect()
      .map(r => r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getString(0), x.getString(1))))
    assert(got(0) == Seq(("a.com", "x"), ("a.com", "y"), ("b.com", "z")))
    assert(got(1) == Seq(("d.com", "q")))
  }

  test("nulls are skipped; duplicates kept like collect_list") {
    import spark.implicits._
    val df = Seq(("k", java.lang.Long.valueOf(3L)), ("k", null),
      ("k", java.lang.Long.valueOf(3L)), ("k", java.lang.Long.valueOf(1L)))
      .toDF("key", "v")
    val got = df.groupBy("key")
      .agg(BoundedTopK.boundedSortedList(col("v"), 10).as("topk"))
      .collect().head.getSeq[Long](1)
    assert(got == Seq(1L, 3L, 3L))
  }

  test("aggregation buffer never exceeds k elements") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.LongType
    val agg = BoundedSortedList(BoundReference(0, LongType, nullable = false), 7)
    var buf = agg.createAggregationBuffer()
    (0 until 1000).foreach { i =>
      buf = agg.update(buf, InternalRow((i * 31 % 997).toLong))
      assert(buf.size <= 7)
    }
    assert(buf.map(_.asInstanceOf[Long]) ==
      (0 until 1000).map(i => (i * 31 % 997).toLong).sorted.take(7))
    // serialize/deserialize round-trip (the partial->final shuffle path)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.map(_.asInstanceOf[Long]) == buf.map(_.asInstanceOf[Long]))
    // merge truncates and stays sorted
    var other = agg.createAggregationBuffer()
    (0 until 20).foreach(i => other = agg.update(other, InternalRow(i.toLong)))
    val merged = agg.merge(buf, other)
    assert(merged.map(_.asInstanceOf[Long]) ==
      (buf ++ other).map(_.asInstanceOf[Long]).sorted.take(7))
  }

  test("plan: partial aggregation, no Window, no full-list state") {
    import spark.implicits._
    val df = (0 until 100).map(i => ((i % 5).toLong, i.toLong))
      .toDF("key", "v").repartition(4)
    val plan = df.groupBy("key")
      .agg(BoundedTopK.boundedSortedList(col("v"), 5).as("topk"))
      .queryExecution.executedPlan.toString
    // two-phase aggregate (map-side partial combine crosses the shuffle)
    assert(plan.contains("partial_bounded_sorted_list"))
    assert(plan.contains("ObjectHashAggregate"))
    assert(!plan.contains("Window"))
  }
}
