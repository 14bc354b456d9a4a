package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary (Misra & Gries, "Finding repeated
  * elements", Sci. Comput. Program. 1982; merge rule from Agarwal et
  * al., "Mergeable Summaries", PODS 2012 §3) — the frequency-sketch
  * member of the repo's sketch family (t-digest = quantiles, Bloom =
  * membership, MG = heavy hitters).
  *
  * What it buys at 100 TB: "top-k hosts of the crawl" as a plain
  * groupBy ships one partial count per (task, distinct-key) — at 10^7
  * distinct hosts over 10^4 tasks that is a 10^11-row shuffle to
  * answer a 25-row question. The MG aggregate ships one CAPACITY-entry
  * summary per task (capacity ≈ 2^11 entries ≈ 100 KB) regardless of
  * row or key count, and the candidate set it returns is then exactly
  * recounted with a broadcast semi-join — the classic two-pass exact
  * top-k: sketch for candidates, rescan for truth.
  *
  * Guarantees (capacity = c, total weight n): every reported estimate
  * `est` satisfies est ≤ f(key) ≤ est + err where `err` is the
  * summary's accumulated decrement depth, err ≤ n/(c+1); every key
  * with f(key) > err SURVIVES in the summary — so the true top-k is a
  * subset of the candidates whenever the k-th frequency exceeds
  * n/(c+1) (any Zipf-ish distribution with c ≫ k), and the summary is
  * EXACT (err = 0, every key present) whenever c ≥ distinct keys —
  * the regime the `heavy_hitters` oracle pins, while MGSpec proves the
  * sub-capacity guarantees under planted skew. Merging is pairwise
  * count-sum followed by subtracting the (c+1)-th largest count from
  * all (PODS'12) — associativity-safe for Spark's partial/final
  * aggregation under any partitioning and retry schedule. */
final class MGSummary(val capacity: Int) {

  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty
  /** Accumulated decrement depth: every estimate undercounts its true
    * frequency by at most this. 0 until the first eviction. */
  var err: Long = 0L
  /** Total weight observed (exact — never decremented). */
  var total: Long = 0L

  def add(key: String): Unit = {
    total += 1
    val c = counts.getOrElse(key, 0L)
    counts(key) = c + 1
    if (c == 0L && counts.size > capacity) shrink()
  }

  /** Subtract the (capacity+1)-th largest count from every entry and
    * drop the non-positive — the single step that both caps the map
    * and preserves the undercount bound. The add path always overflows
    * by exactly one, where the (capacity+1)-th largest IS the minimum
    * — found in one O(c) pass instead of a sort; only merge (rare:
    * once per partial-combine) can overflow further and pay the
    * O(c log c) selection. */
  private def shrink(): Unit = {
    val d =
      if (counts.size == capacity + 1) counts.values.min
      else {
        val vals = counts.values.toArray
        java.util.Arrays.sort(vals)
        vals(vals.length - 1 - capacity)
      }
    err += d
    counts.filterInPlace((_, v) => v > d)
    counts.mapValuesInPlace((_, v) => v - d)
  }

  def merge(o: MGSummary): Unit = {
    require(capacity == o.capacity,
      s"merging MG summaries of different capacities: $capacity vs ${o.capacity}")
    total += o.total
    err += o.err
    o.counts.foreach { case (k, v) =>
      counts(k) = counts.getOrElse(k, 0L) + v
    }
    if (counts.size > capacity) shrink()
  }

  def isEmpty: Boolean = total == 0L

  def toBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(capacity)
    out.writeLong(total)
    out.writeLong(err)
    out.writeInt(counts.size)
    counts.foreach { case (k, v) => out.writeUTF(k); out.writeLong(v) }
    out.flush()
    bos.toByteArray
  }
}

object MGSummary {
  def fromBytes(bytes: Array[Byte]): MGSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new MGSummary(in.readInt())
    s.total = in.readLong()
    s.err = in.readLong()
    var n = in.readInt()
    while (n > 0) { s.counts(in.readUTF()) = in.readLong(); n -= 1 }
    s
  }
}

/** MG summary of a string key column, evaluated to its entries as
  * array<struct<key, est, err>> sorted by (est desc, key asc) — a
  * deterministic order so downstream plans and oracles are stable. */
final case class MGTopKAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGSummary]
  with UnaryLike[Expression] {

  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  override def createAggregationBuffer(): MGSummary = new MGSummary(capacity)

  override def update(buf: MGSummary, input: InternalRow): MGSummary = {
    val v = child.eval(input)
    if (v != null) buf.add(v.toString)
    buf
  }

  override def merge(a: MGSummary, b: MGSummary): MGSummary = {
    a.merge(b); a
  }

  override def eval(buf: MGSummary): Any = {
    val entries = buf.counts.toArray
      .sortBy { case (k, v) => (-v, k) }
      .map { case (k, v) =>
        InternalRow(UTF8String.fromString(k), v, buf.err)
      }
    new GenericArrayData(entries.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: MGSummary): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): MGSummary =
    MGSummary.fromBytes(bytes)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "mg_topk"
  override def withNewMutableAggBufferOffset(newOffset: Int): MGTopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MGTopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MGTopKAgg =
    copy(child = newChild)
}

/** Column API. */
object FreqSketch {
  /** Heavy-hitter candidates of a string key column: entries of a
    * capacity-bounded MG summary, (est desc, key asc)-ordered. */
  def mgTopK(key: Column, capacity: Int): Column =
    ColumnBridge.column(
      MGTopKAgg(ColumnBridge.expression(key), capacity)
        .toAggregateExpression())
}
