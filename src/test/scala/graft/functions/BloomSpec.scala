package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** The first-party Bloom filter's contracts: zero false negatives (the
  * probe uses the identical key-hash/bit derivation as the build), the
  * false-positive rate stays near the sized-for bound, the distributed
  * aggregate (map-side partials OR-merged across partitions) is
  * byte-identical to a serial single-thread build, and incompatible
  * merges fail loudly. */
class BloomSpec extends AnyFunSuite with SparkSuite {

  private val N = 10000
  private val inserted: Seq[Long] = (0 until N).map(i => BloomOps.mix(i.toLong))
  private val absent: Seq[Long] =
    (0 until N).map(i => BloomOps.mix(0x0fff000000L + i))

  private def serialBuild(keys: Seq[Long], mBits: Long, k: Int): Array[Byte] = {
    val words = new Array[Long]((mBits / 64).toInt)
    keys.foreach(BloomOps.setBits(words, _, k))
    BloomOps.toBytes(words, k)
  }

  test("no false negatives, ever: every inserted key tests positive") {
    val mBits = Bloom.optimalBits(N, 0.01)
    val bytes = serialBuild(inserted, mBits, Bloom.optimalK(N, mBits))
    assert(inserted.forall(BloomOps.mightContain(bytes, _)))
  }

  test("false-positive rate is near the sized-for bound (1% target, " +
    "2% ceiling on 10k disjoint probes)") {
    val mBits = Bloom.optimalBits(N, 0.01)
    val bytes = serialBuild(inserted, mBits, Bloom.optimalK(N, mBits))
    val fp = absent.count(BloomOps.mightContain(bytes, _))
    assert(fp <= N / 50, s"fp=$fp of $N")
    // and it isn't trivially accepting everything
    assert(fp < N / 2)
  }

  test("distributed aggregate over 8 partitions is byte-identical to " +
    "the serial build (merge is a plain OR — order-free)") {
    val sp = spark; import sp.implicits._
    val mBits = Bloom.optimalBits(N, 0.01)
    val k = Bloom.optimalK(N, mBits)
    val got = inserted.toDF("h").repartition(8)
      .agg(Bloom.agg(col("h"), mBits, k).as("bloom"))
      .collect()(0).getAs[Array[Byte]]("bloom")
    assert(java.util.Arrays.equals(got, serialBuild(inserted, mBits, k)))
  }

  test("serialized header round-trips (k, word count) and merging " +
    "different sizes fails loudly") {
    val bytes = serialBuild(inserted.take(10), 1024, 5)
    val (words, k) = BloomOps.fromBytes(bytes)
    assert(k == 5 && words.length == 16)
    assert(java.util.Arrays.equals(BloomOps.toBytes(words, k), bytes))
    val agg = BloomAgg(null, 1024, 5)
    intercept[IllegalArgumentException] {
      agg.merge(new Array[Long](16), new Array[Long](32))
    }
  }

  test("optimal sizing: ~10 bits/key at 1% and k near m/n·ln2") {
    val m = Bloom.optimalBits(1000000, 0.01)
    assert(m >= 9000000 && m <= 10000000, m)
    val k = Bloom.optimalK(1000000, m)
    assert(k >= 6 && k <= 8, k)
  }
}
