package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** First-party Bloom filter as a Spark aggregate + codegen probe — the
  * row-level runtime membership prefilter for store-probe joins.
  *
  * Why it exists here: the incremental-dedup shape probes every crawl
  * increment row against the frozen corpus store
  * (`ops/DedupStore.dedupIncrement`). The bucketed store already keeps
  * the STORE side from reshuffling; what still moves every increment is
  * the increment itself — every row shuffles into the store's bucket
  * layout to ask a question whose answer is almost always "not present"
  * (fresh crawl text is mostly new). A Bloom filter over the store's
  * signature keys — 10 bits/key ≈ 1.2 GB at 10^9 stored docs, a
  * broadcastable one-row table — answers the common case map-side with
  * ZERO false negatives, so only probable hits (true dups + the fpp
  * mass) reach the join. This is the same design Spark's own runtime
  * row-level filters inject for shuffle joins (SPARK-32268: a
  * BloomFilterAggregate on the creation side, a might-contain probe on
  * the application side); it is re-derived here as a first-party
  * aggregate because the built-in rule neither triggers on broadcast
  * one-row crossJoin shapes nor exposes the filter for REUSE across the
  * many per-increment queries a store serves. Scope note: the filter
  * covers doc-count-sized key sets (signatures). Window/span sets
  * (~10^11 keys at 100 TB ≈ 125 GB of filter) stay on the bucketed
  * `spans` table — a Bloom filter that cannot broadcast is worse than
  * the bucket-local join it would replace.
  *
  * Determinism: bit positions derive from the input key hash by double
  * hashing (Kirsch & Mitzenmacher, ESA 2006: two hashes h1 + i·h2 give
  * asymptotically the same fpp as k independent hashes); h1/h2 come
  * from the SplitMix64 finalizer (Steele, Lea & Flood, OOPSLA 2014 —
  * public domain) over the key hash, so the same key always sets/tests
  * the same bits on every engine and the aggregate's merge is a plain
  * bitwise OR (commutative, associative — safe under any partitioning
  * and retry schedule).
  *
  * Serialized form: [k: int32][nWords: int32][words: int64 × nWords],
  * big-endian. k and m travel WITH the bytes so a probe can never be
  * mis-parameterized against a stored filter, and merge() can reject
  * incompatible shapes loudly.
  */
object BloomOps {

  /** SplitMix64 finalizer — the avalanche mix used to derive the two
    * double-hashing bases from one 64-bit key hash. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def setBits(words: Array[Long], keyHash: Long, k: Int): Unit = {
    val m = words.length.toLong * 64
    var h = mix(keyHash)
    val h2 = mix(keyHash ^ 0x5851f42d4c957f2dL) | 1L
    var i = 0
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(h, m)
      words((bit >>> 6).toInt) |= 1L << (bit & 63)
      h += h2
      i += 1
    }
  }

  /** True if the key MAY be in the set; false is definitive absence.
    * Called from codegen (StaticInvoke) — keep it allocation-free. */
  def mightContain(bytes: Array[Byte], keyHash: Long): Boolean = {
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt(0)
    val nWords = bb.getInt(4)
    val m = nWords.toLong * 64
    var h = mix(keyHash)
    val h2 = mix(keyHash ^ 0x5851f42d4c957f2dL) | 1L
    var i = 0
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(h, m)
      if ((bb.getLong(8 + 8 * (bit >>> 6).toInt) & (1L << (bit & 63))) == 0L)
        return false
      h += h2
      i += 1
    }
    true
  }

  def toBytes(words: Array[Long], k: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * words.length)
    bb.putInt(k).putInt(words.length)
    var i = 0
    while (i < words.length) { bb.putLong(words(i)); i += 1 }
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): (Array[Long], Int) = {
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt()
    val words = new Array[Long](bb.getInt())
    var i = 0
    while (i < words.length) { words(i) = bb.getLong(); i += 1 }
    (words, k)
  }
}

/** Bloom filter of a LONG key-hash column, evaluated to its serialized
  * bytes. Distributive: partial filters OR together, so map-side
  * combine ships one fixed-size bit array per task regardless of row
  * count — the build over a 10^9-key store shuffles
  * tasks × filter-size bytes, never rows. */
final case class BloomAgg(
    child: Expression,
    mBits: Long,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(mBits >= 64 && mBits % 64 == 0,
    s"mBits must be a positive multiple of 64, got $mBits")
  require(k >= 1 && k <= 64, s"k must be in [1,64], got $k")
  require(mBits / 64 <= Int.MaxValue.toLong, s"filter too large: $mBits bits")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long]((mBits / 64).toInt)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomOps.setBits(buf, v.asInstanceOf[Long], k)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    require(a.length == b.length, "merging Bloom filters of different sizes")
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = BloomOps.toBytes(buf, k)

  override def serialize(buf: Array[Long]): Array[Byte] =
    BloomOps.toBytes(buf, k)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomOps.fromBytes(bytes)._1

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"
  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}

/** Column API. */
object Bloom {

  /** Optimal bit count for `n` keys at false-positive rate `fpp`
    * (m = −n·ln p ∕ ln²2), rounded up to a whole word. */
  def optimalBits(n: Long, fpp: Double): Long = {
    require(n > 0 && fpp > 0 && fpp < 1)
    val m = math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    ((m + 63) / 64) * 64
  }

  /** Optimal probe count for `n` keys in `mBits` bits (k = m/n·ln2). */
  def optimalK(n: Long, mBits: Long): Int =
    math.max(1, math.round(mBits.toDouble / n * math.log(2)).toInt)

  /** Aggregate a long key-hash column into filter bytes. */
  def agg(keyHash: Column, mBits: Long, k: Int): Column =
    ColumnBridge.column(
      BloomAgg(ColumnBridge.expression(keyHash), mBits, k)
        .toAggregateExpression())

  /** Codegen membership probe: false is DEFINITIVE absence (same hash
    * derivation as the build), true means "verify exactly". */
  def mightContain(filter: Column, keyHash: Column): Column =
    ColumnBridge.column(StaticInvoke(
      Class.forName("graft.functions.BloomOps"), BooleanType, "mightContain",
      Seq(ColumnBridge.expression(filter), ColumnBridge.expression(keyHash)),
      Seq(BinaryType, LongType)))
}
