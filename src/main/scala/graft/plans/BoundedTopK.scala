package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType}

/** A9/T5 at 100 TB — bounded-state top-k aggregation.
  *
  * `slice(array_sort(collect_list(x)), 1, k)` is semantically the k
  * smallest elements, but collect_list's aggregation buffer holds EVERY
  * row of the group before the sort+slice evaluates: one hot key (a
  * page with tens of millions of inlinks — LinkDb.java:149-239 caps at
  * db.max.inlinks exactly because such pages exist) concentrates the
  * whole group in a single task's buffer, and AQE cannot split an
  * aggregation group. [[BoundedSortedList]] is the same result with an
  * O(k) buffer: a sorted array capped at k on every insert, partial
  * (map-side) combine via sorted-merge-truncate, so the hot key's
  * state never exceeds k elements on any task at any scale.
  *
  * Exactness: the k smallest of a group = merge of the k smallest of
  * any partition of the group (each global top-k element is in its
  * partition's top-k) — so partial aggregation loses nothing, and ties
  * are value-equal so survivor identity doesn't matter.
  */
object BoundedTopK {

  /** Aggregate: array of the k smallest non-null values of `c` under
    * the type's natural (array_sort) ordering, ascending. Byte-exact
    * replacement for `slice(array_sort(collect_list(c)), 1, k)`. */
  def boundedSortedList(c: Column, k: Int): Column =
    ColumnBridge.column(
      BoundedSortedList(ColumnBridge.expression(c), k)
        .toAggregateExpression())
}

final case class BoundedSortedList(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Any]]
  with UnaryLike[Expression] {

  require(k > 0, "bounded_sorted_list needs k > 0")

  @transient private lazy val ordering =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty

  /** Insert keeping the buffer sorted ascending and capped at k.
    * Fast reject: a full buffer whose max <= v never changes. */
  override def update(buf: mutable.ArrayBuffer[Any],
      input: InternalRow): mutable.ArrayBuffer[Any] = {
    val v = child.eval(input)
    if (v != null && (buf.size < k || ordering.lt(v, buf.last))) {
      val copied = InternalRow.copyValue(v)
      var lo = 0
      var hi = buf.size
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (ordering.lteq(buf(mid), copied)) lo = mid + 1 else hi = mid
      }
      buf.insert(lo, copied)
      if (buf.size > k) buf.remove(buf.size - 1)
    }
    buf
  }

  /** Sorted-merge of two sorted buffers, truncated at k. */
  override def merge(a: mutable.ArrayBuffer[Any],
      b: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    if (b.isEmpty) return a
    if (a.isEmpty) return b
    val out = new mutable.ArrayBuffer[Any](math.min(a.size + b.size, k))
    var i = 0
    var j = 0
    while (out.size < k && (i < a.size || j < b.size)) {
      if (j >= b.size || (i < a.size && ordering.lteq(a(i), b(j)))) {
        out += a(i); i += 1
      } else {
        out += b(j); j += 1
      }
    }
    out
  }

  override def eval(buf: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buf.toArray)

  // serialization for shuffle between partial and final aggregation —
  // the one-column UnsafeRow(array) framing collect_list uses
  @transient private lazy val projection =
    UnsafeProjection.create(Array[DataType](dataType))

  override def serialize(buf: mutable.ArrayBuffer[Any]): Array[Byte] =
    projection.apply(InternalRow(new GenericArrayData(buf.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Any] = {
    val buf = createAggregationBuffer()
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    row.getArray(0).foreach(child.dataType, (_, x: Any) => buf += x)
    buf
  }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(child.dataType, prettyName)
  override def prettyName: String = "bounded_sorted_list"

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedSortedList =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedSortedList =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedSortedList =
    copy(child = newChild)
}
