package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** First-party merging t-digest (Dunning & Ertl, "Computing Extremely
  * Accurate Quantiles Using t-Digests", arXiv:1902.04023) — the
  * mergeable quantile sketch the reference builds its score/latency
  * distributions on (`CrawlDbReader.java:481-507` merges per-status
  * `MergingDigest(100)` sketches of the score column;
  * `Fetcher.java:507-525` ships latency digests through the shuffle;
  * `UpdateHostDbReducer.java:273-279,391-396` digests per-host numeric
  * fields). Until this class, `percentile_approx` stood in (SURVEY
  * §7.4's documented divergence): same accuracy/state trade, different
  * sketch family, no digest-bytes interchange. This closes that gap
  * with the same algorithm family and compression (δ=100) as the
  * reference.
  *
  * Algorithm (the paper's merging variant, re-derived from the paper —
  * no reference code involved): points buffer unmerged; a flush sorts
  * buffer+centroids by mean and greedily re-clusters left to right,
  * letting a cluster absorb its successor while the combined k-span
  * stays ≤ 1 under the k₁ scale function k(q) = δ/(2π)·asin(2q−1).
  * k₁ spends its resolution at the tails (cluster size → 1 as q → 0
  * or 1), which is why t-digest's relative error at q=0.001 beats
  * uniform-bin sketches. State is O(δ) always: ≤ ~2δ centroids plus a
  * fixed insert buffer, regardless of stream length — safe for a
  * 10^11-row shuffle-side partial aggregate.
  *
  * Quantile read-out interpolates piecewise-linearly through the
  * centroid mass centers (cum_i + w_i/2, mean_i) with (0, min) and
  * (total, max) as exact endpoints, so q→0/1 converge to the true
  * extremes. Byte serialization is deterministic
  * (compression, min, max, n, then (mean, weight) pairs) and
  * roundtrip-exact; digests serialized at sf0.01 merge with digests
  * from any other increment without rescanning rows — the
  * CrawlDbReader "merge stored per-segment sketches" pattern. Byte
  * parity with the com.tdunning wire format is NOT claimed: that
  * library is unavailable in this sandbox, so cross-library byte
  * equality would be an unverifiable assertion; the interchange story
  * here is self-parity (our bytes, any JVM, any round).
  *
  * Not used on oracle-checked paths: sketch estimates are
  * merge-order-dependent in float, so DuckDB-hash-compared queries
  * keep the exact histogram forms (Relational.valueHistogram).
  */
final class MergingTDigest(val compression: Double) extends Serializable {
  import MergingTDigest._

  require(compression >= 10.0, s"compression $compression too small")

  // merged centroids, ascending by mean
  private var meanArr = new Array[Double](centroidCapacity(compression))
  private var weightArr = new Array[Double](centroidCapacity(compression))
  private var nCentroids = 0
  private var mergedTotal = 0.0

  // unmerged insert buffer
  private val bufSize = math.max((5 * compression).toInt, 256)
  private val bufMean = new Array[Double](bufSize)
  private val bufWeight = new Array[Double](bufSize)
  private var nBuf = 0
  private var bufTotal = 0.0

  private var minVal = Double.PositiveInfinity
  private var maxVal = Double.NegativeInfinity

  // Alternate the greedy merge direction per flush: a fixed
  // left-to-right pass systematically over-fills the clusters near its
  // starting end across repeated compactions (measured here as 5×
  // rank-error loss at q=0.001 with the high tail unaffected);
  // alternating restores tail symmetry — the same remedy the paper's
  // reference implementation applies.
  private var reverseNext = false

  def totalWeight: Double = mergedTotal + bufTotal
  def isEmpty: Boolean = totalWeight == 0.0
  def min: Double = minVal
  def max: Double = maxVal

  /** Centroid count after compaction (tests assert the O(δ) bound). */
  def centroidCount: Int = { flush(); nCentroids }

  def add(x: Double, w: Double = 1.0): Unit = {
    if (java.lang.Double.isNaN(x) || w <= 0.0) return
    if (nBuf == bufSize) flush()
    bufMean(nBuf) = x
    bufWeight(nBuf) = w
    nBuf += 1
    bufTotal += w
    if (x < minVal) minVal = x
    if (x > maxVal) maxVal = x
  }

  /** Merge another digest in: its centroids become weighted points
    * (exact min/max carried explicitly — centroid means are interior). */
  def merge(other: MergingTDigest): Unit = {
    other.flush()
    var i = 0
    while (i < other.nCentroids) {
      add(other.meanArr(i), other.weightArr(i))
      i += 1
    }
    if (other.minVal < minVal) minVal = other.minVal
    if (other.maxVal > maxVal) maxVal = other.maxVal
  }

  // --- k1 scale function ---------------------------------------------
  private def scaleK(q: Double): Double = {
    val qc = math.max(0.0, math.min(1.0, q))
    compression / (2.0 * math.Pi) * math.asin(2.0 * qc - 1.0)
  }

  /** q bound one k-unit right of q0 (1.0 when past the scale's end). */
  private def qRight(q0: Double): Double = {
    val k = scaleK(q0) + 1.0
    if (k >= compression / 4.0) 1.0
    else (math.sin(2.0 * math.Pi * k / compression) + 1.0) / 2.0
  }

  /** Compact buffer + centroids into ≤ ~2δ centroids (paper Fig. 2).
    * The greedy pass walks from one end, absorbing while the cluster's
    * k-span stays ≤ 1; k₁ is antisymmetric about q=0.5, so the
    * mirrored pass uses the identical absorb test on mass accumulated
    * from the right. */
  private def flush(): Unit = {
    if (nBuf == 0) return
    sortBuffer()
    val reverse = reverseNext
    reverseNext = !reverseNext
    val newTotal = mergedTotal + bufTotal
    val outMean = new Array[Double](meanArr.length)
    val outWeight = new Array[Double](weightArr.length)
    var out = 0
    var wSoFar = 0.0 // weight of fully emitted clusters
    var qLimit = newTotal * qRight(0.0)
    var curMean = 0.0
    var curWeight = 0.0
    // cursors walk ascending means (forward) or descending (reverse)
    var i = if (reverse) nCentroids - 1 else 0
    var j = if (reverse) nBuf - 1 else 0
    val step = if (reverse) -1 else 1
    def iLive = if (reverse) i >= 0 else i < nCentroids
    def jLive = if (reverse) j >= 0 else j < nBuf
    while (iLive || jLive) {
      var m = 0.0
      var w = 0.0
      val takeMerged = iLive && (!jLive ||
        (if (reverse) meanArr(i) >= bufMean(j) else meanArr(i) <= bufMean(j)))
      if (takeMerged) {
        m = meanArr(i); w = weightArr(i); i += step
      } else {
        m = bufMean(j); w = bufWeight(j); j += step
      }
      if (curWeight == 0.0) {
        curMean = m; curWeight = w
      } else if (wSoFar + curWeight + w <= qLimit) {
        // absorb: combined cluster still spans ≤ 1 k-unit
        curWeight += w
        curMean += (m - curMean) * w / curWeight
      } else {
        outMean(out) = curMean; outWeight(out) = curWeight; out += 1
        wSoFar += curWeight
        qLimit = newTotal * qRight(wSoFar / newTotal)
        curMean = m; curWeight = w
      }
    }
    if (curWeight > 0.0) {
      outMean(out) = curMean; outWeight(out) = curWeight; out += 1
    }
    if (reverse) { // emitted descending — restore ascending order
      var a = 0
      var b = out - 1
      while (a < b) {
        val tm = outMean(a); outMean(a) = outMean(b); outMean(b) = tm
        val tw = outWeight(a); outWeight(a) = outWeight(b); outWeight(b) = tw
        a += 1; b -= 1
      }
    }
    meanArr = outMean
    weightArr = outWeight
    nCentroids = out
    mergedTotal = newTotal
    nBuf = 0
    bufTotal = 0.0
  }

  /** Insertion sort of the buffer by mean — the buffer arrives nearly
    * unordered but short (≤ 5δ); dual-array in-place keeps zero alloc. */
  private def sortBuffer(): Unit = {
    var i = 1
    while (i < nBuf) {
      val m = bufMean(i)
      val w = bufWeight(i)
      var j = i - 1
      while (j >= 0 && bufMean(j) > m) {
        bufMean(j + 1) = bufMean(j)
        bufWeight(j + 1) = bufWeight(j)
        j -= 1
      }
      bufMean(j + 1) = m
      bufWeight(j + 1) = w
      i += 1
    }
  }

  /** Quantile estimate: piecewise-linear through centroid mass centers,
    * exact at q ∈ {0, 1} (true min/max are carried). NaN when empty. */
  def quantile(q: Double): Double = {
    flush()
    if (nCentroids == 0) return Double.NaN
    if (q <= 0.0) return minVal
    if (q >= 1.0) return maxVal
    if (nCentroids == 1) return meanArr(0)
    val target = q * mergedTotal
    val firstCenter = weightArr(0) / 2.0
    if (target < firstCenter) {
      // below the first mass center: blend from the exact min
      return minVal + target / firstCenter * (meanArr(0) - minVal)
    }
    var cum = 0.0
    var i = 0
    while (i < nCentroids - 1) {
      val leftCenter = cum + weightArr(i) / 2.0
      val rightCenter = cum + weightArr(i) + weightArr(i + 1) / 2.0
      if (target < rightCenter) {
        val f = (target - leftCenter) / (rightCenter - leftCenter)
        return meanArr(i) + f * (meanArr(i + 1) - meanArr(i))
      }
      cum += weightArr(i)
      i += 1
    }
    // past the last mass center: blend toward the exact max
    val lastCenter = cum + weightArr(nCentroids - 1) / 2.0
    val span = mergedTotal - lastCenter
    if (span <= 0.0) maxVal
    else meanArr(nCentroids - 1) +
      (target - lastCenter) / span * (maxVal - meanArr(nCentroids - 1))
  }

  /** Deterministic bytes: compression, min, max, n, (mean, weight)*n.
    * Roundtrip-exact (fromBytes(toBytes(d)) re-serializes byte-equal). */
  def toBytes: Array[Byte] = {
    flush()
    val bb = ByteBuffer.allocate(8 * 3 + 4 + nCentroids * 16)
    bb.putDouble(compression)
    bb.putDouble(minVal)
    bb.putDouble(maxVal)
    bb.putInt(nCentroids)
    var i = 0
    while (i < nCentroids) {
      bb.putDouble(meanArr(i))
      bb.putDouble(weightArr(i))
      i += 1
    }
    bb.array()
  }
}

object MergingTDigest {
  /** k1 emits clusters of k-span ∈ (0.5, 1] after repeated compaction;
    * total span is δ/2 k-units, so ≤ δ clusters steady-state. During a
    * single flush spans can be as small as just-over-aborbable — 2δ+8
    * covers the transient worst case (asserted in TDigestSpec). */
  private[functions] def centroidCapacity(compression: Double): Int =
    (2 * compression).toInt + 8

  def fromBytes(bytes: Array[Byte]): MergingTDigest = {
    val bb = ByteBuffer.wrap(bytes)
    val d = new MergingTDigest(bb.getDouble)
    val mn = bb.getDouble
    val mx = bb.getDouble
    val n = bb.getInt
    var i = 0
    while (i < n) {
      d.add(bb.getDouble, bb.getDouble)
      i += 1
    }
    if (n > 0) { // exact extremes override centroid-mean bounds
      d.minVal = mn
      d.maxVal = mx
    }
    d
  }
}

/** t-digest of a double column, evaluated at fixed quantiles.
  * Null-on-empty like percentile_approx so coalesce() wrappers hold. */
final case class TDigestQuantilesAgg(
    child: Expression,
    quantiles: Seq[Double],
    compression: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MergingTDigest]
  with UnaryLike[Expression] {

  require(quantiles.nonEmpty && quantiles.forall(q => q >= 0 && q <= 1))

  override def createAggregationBuffer(): MergingTDigest =
    new MergingTDigest(compression)

  override def update(buf: MergingTDigest, input: InternalRow): MergingTDigest = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: MergingTDigest, b: MergingTDigest): MergingTDigest = {
    a.merge(b); a
  }

  override def eval(buf: MergingTDigest): Any =
    if (buf.isEmpty) null
    else new GenericArrayData(quantiles.map(buf.quantile).toArray)

  override def serialize(buf: MergingTDigest): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): MergingTDigest =
    MergingTDigest.fromBytes(bytes)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "tdigest_quantiles"
  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestQuantilesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestQuantilesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TDigestQuantilesAgg =
    copy(child = newChild)
}

/** t-digest of a double column as its serialized bytes — the stored
  * sketch the reference ships through hostdb metadata / segment output
  * and merges later without rescanning rows. Null on empty input. */
final case class TDigestSketchAgg(
    child: Expression,
    compression: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MergingTDigest]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): MergingTDigest =
    new MergingTDigest(compression)

  override def update(buf: MergingTDigest, input: InternalRow): MergingTDigest = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: MergingTDigest, b: MergingTDigest): MergingTDigest = {
    a.merge(b); a
  }

  override def eval(buf: MergingTDigest): Any =
    if (buf.isEmpty) null else buf.toBytes

  override def serialize(buf: MergingTDigest): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): MergingTDigest =
    MergingTDigest.fromBytes(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "tdigest_sketch"
  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TDigestSketchAgg =
    copy(child = newChild)
}

/** Merge stored digest bytes (a column of sketches from prior rounds /
  * segments) into one digest, evaluated at fixed quantiles — the
  * CrawlDbReader.java:481-507 shape: per-part sketches in, one
  * distribution out, no raw-row rescan. */
final case class TDigestMergeAgg(
    child: Expression,
    quantiles: Seq[Double],
    compression: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MergingTDigest]
  with UnaryLike[Expression] {

  require(quantiles.nonEmpty && quantiles.forall(q => q >= 0 && q <= 1))

  override def createAggregationBuffer(): MergingTDigest =
    new MergingTDigest(compression)

  override def update(buf: MergingTDigest, input: InternalRow): MergingTDigest = {
    val v = child.eval(input)
    if (v != null) buf.merge(MergingTDigest.fromBytes(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(a: MergingTDigest, b: MergingTDigest): MergingTDigest = {
    a.merge(b); a
  }

  override def eval(buf: MergingTDigest): Any =
    if (buf.isEmpty) null
    else new GenericArrayData(quantiles.map(buf.quantile).toArray)

  override def serialize(buf: MergingTDigest): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): MergingTDigest =
    MergingTDigest.fromBytes(bytes)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "tdigest_merge"
  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TDigestMergeAgg =
    copy(child = newChild)
}

/** Static read-outs for stored sketch bytes (StaticInvoke — codegen'd,
  * like HistOps). weight/min/max are the digest's EXACTLY-maintained
  * invariants (total weight is a sum of row counts — exact in double
  * below 2^53; extremes are carried verbatim), so they hash-compare
  * against an exact engine even though quantiles are estimates. */
object TDigestOps {
  def quantileOf(bytes: Array[Byte], q: Double): Double =
    MergingTDigest.fromBytes(bytes).quantile(q)

  def weightOf(bytes: Array[Byte]): Double = {
    val bb = ByteBuffer.wrap(bytes)
    bb.getDouble; bb.getDouble; bb.getDouble // compression, min, max
    val n = bb.getInt
    var s = 0.0
    var i = 0
    while (i < n) { bb.getDouble; s += bb.getDouble; i += 1 }
    s
  }

  def minOf(bytes: Array[Byte]): Double = ByteBuffer.wrap(bytes).getDouble(8)
  def maxOf(bytes: Array[Byte]): Double = ByteBuffer.wrap(bytes).getDouble(16)
}

/** Column API. Compression defaults to the reference's δ=100
  * (`TDigest.createMergingDigest(100.0)` everywhere it appears). */
object TDigest {

  val DefaultCompression = 100.0

  /** array<double> of quantile estimates of `c` (cast to double first). */
  def quantileAgg(c: Column, qs: Seq[Double],
      compression: Double = DefaultCompression): Column =
    ColumnBridge.column(
      TDigestQuantilesAgg(ColumnBridge.expression(c.cast("double")), qs,
        compression).toAggregateExpression())

  /** Serialized digest of `c` — store it, ship it, merge it later. */
  def sketch(c: Column, compression: Double = DefaultCompression): Column =
    ColumnBridge.column(
      TDigestSketchAgg(ColumnBridge.expression(c.cast("double")),
        compression).toAggregateExpression())

  /** Merge a column of stored sketches, evaluate quantiles. */
  def mergeQuantiles(sketches: Column, qs: Seq[Double],
      compression: Double = DefaultCompression): Column =
    ColumnBridge.column(
      TDigestMergeAgg(ColumnBridge.expression(sketches), qs,
        compression).toAggregateExpression())

  /** Scalar quantile read-out of one stored sketch. */
  def quantileOf(sketch: Column, q: Double): Column =
    ColumnBridge.column(StaticInvoke(
      Class.forName("graft.functions.TDigestOps"), DoubleType, "quantileOf",
      Seq(ColumnBridge.expression(sketch),
        ColumnBridge.expression(org.apache.spark.sql.functions.lit(q))),
      Seq(BinaryType, DoubleType)))

  private def reader(fn: String, sketch: Column): Column =
    ColumnBridge.column(StaticInvoke(
      Class.forName("graft.functions.TDigestOps"), DoubleType, fn,
      Seq(ColumnBridge.expression(sketch)), Seq(BinaryType)))

  /** Exact invariants of a stored sketch: total weight, min, max. */
  def weightOf(sketch: Column): Column = reader("weightOf", sketch)
  def minOf(sketch: Column): Column = reader("minOf", sketch)
  def maxOf(sketch: Column): Column = reader("maxOf", sketch)
}
