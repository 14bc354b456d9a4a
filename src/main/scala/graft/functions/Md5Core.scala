package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Direct MD5 (RFC 1321) specialized for the 60-bit hash hot path
  * (r15). `java.security.MessageDigest` costs, PER CALL: an engine
  * dispatch, an internal buffer copy, a 16-byte output allocation, and
  * a state reset — significant when the input is a 5-char shingle and
  * the board computes hundreds of millions of them. This computes the
  * compression function in place over the UTF8String's own bytes
  * (no input copy for full blocks — `getByte` reads through), reuses
  * thread-local scratch for the message schedule and padded tail, and
  * materializes only the first 8 digest bytes (all md5Long needs).
  *
  * Bit-exactness vs MessageDigest("MD5") is pinned by HashOpsSpec over
  * block-boundary lengths (0, 1, 55, 56, 57, 63, 64, 65, 119, 120,
  * 128, 300) and random unicode — the 60-bit value feeds every
  * oracle-checked hash, so any drift fails the DuckDB compare too. */
private[functions] object Md5Core {

  private val S = Array(
    7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
    5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20,
    4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
    6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21)

  private val K = Array[Int](
    0xd76aa478, 0xe8c7b756, 0x242070db, 0xc1bdceee,
    0xf57c0faf, 0x4787c62a, 0xa8304613, 0xfd469501,
    0x698098d8, 0x8b44f7af, 0xffff5bb1, 0x895cd7be,
    0x6b901122, 0xfd987193, 0xa679438e, 0x49b40821,
    0xf61e2562, 0xc040b340, 0x265e5a51, 0xe9b6c7aa,
    0xd62f105d, 0x02441453, 0xd8a1e681, 0xe7d3fbc8,
    0x21e1cde6, 0xc33707d6, 0xf4d50d87, 0x455a14ed,
    0xa9e3e905, 0xfcefa3f8, 0x676f02d9, 0x8d2a4c8a,
    0xfffa3942, 0x8771f681, 0x6d9d6122, 0xfde5380c,
    0xa4beea44, 0x4bdecfa9, 0xf6bb4b60, 0xbebfbc70,
    0x289b7ec6, 0xeaa127fa, 0xd4ef3085, 0x04881d05,
    0xd9d4d039, 0xe6db99e5, 0x1fa27cf8, 0xc4ac5665,
    0xf4292244, 0x432aff97, 0xab9423a7, 0xfc93a039,
    0x655b59c3, 0x8f0ccc92, 0xffeff47d, 0x85845dd1,
    0x6fa87e4f, 0xfe2ce6e0, 0xa3014314, 0x4e0811a1,
    0xf7537e82, 0xbd3af235, 0x2ad7d2bb, 0xeb86d391)

  private final class Scratch {
    val m = new Array[Int](16)
    val tail = new Array[Byte](128)
    var a = 0; var b = 0; var c = 0; var d = 0
  }

  private val scratch = new ThreadLocal[Scratch] {
    override def initialValue(): Scratch = new Scratch
  }

  /** One compression round over st.m into (st.a..st.d). */
  private def compress(st: Scratch): Unit = {
    val m = st.m
    var aa = st.a; var bb = st.b; var cc = st.c; var dd = st.d
    var i = 0
    while (i < 64) {
      var f = 0
      var g = 0
      if (i < 16) { f = (bb & cc) | (~bb & dd); g = i }
      else if (i < 32) { f = (dd & bb) | (~dd & cc); g = (5 * i + 1) & 15 }
      else if (i < 48) { f = bb ^ cc ^ dd; g = (3 * i + 5) & 15 }
      else { f = cc ^ (bb | ~dd); g = (7 * i) & 15 }
      val tmp = dd
      dd = cc
      cc = bb
      bb = bb + Integer.rotateLeft(aa + f + K(i) + m(g), S(i))
      aa = tmp
      i += 1
    }
    st.a += aa; st.b += bb; st.c += cc; st.d += dd
  }

  /** First 60 bits of MD5(s's bytes), = parse of hex chars 1..15 —
    * digest bytes 0..6 (state word A little-endian, then B's low
    * three) plus byte 7's high nibble. */
  def md5Long60(s: UTF8String): Long = {
    val st = scratch.get()
    st.a = 0x67452301; st.b = 0xefcdab89
    st.c = 0x98badcfe; st.d = 0x10325476
    val len = s.numBytes()
    val m = st.m
    var off = 0
    while (len - off >= 64) {
      var j = 0
      while (j < 16) {
        val p = off + 4 * j
        m(j) = (s.getByte(p) & 0xff) |
          ((s.getByte(p + 1) & 0xff) << 8) |
          ((s.getByte(p + 2) & 0xff) << 16) |
          ((s.getByte(p + 3) & 0xff) << 24)
        j += 1
      }
      compress(st)
      off += 64
    }
    // padded tail: r remaining bytes, 0x80, zeros, 8-byte bit length LE
    val r = len - off
    val tail = st.tail
    val tl = if (r >= 56) 128 else 64
    java.util.Arrays.fill(tail, 0, tl, 0.toByte)
    var i = 0
    while (i < r) { tail(i) = s.getByte(off + i); i += 1 }
    tail(r) = 0x80.toByte
    val bitLen = len.toLong * 8
    i = 0
    while (i < 8) {
      tail(tl - 8 + i) = ((bitLen >>> (8 * i)) & 0xff).toByte
      i += 1
    }
    var blk = 0
    while (blk < tl) {
      var j = 0
      while (j < 16) {
        val p = blk + 4 * j
        m(j) = (tail(p) & 0xff) |
          ((tail(p + 1) & 0xff) << 8) |
          ((tail(p + 2) & 0xff) << 16) |
          ((tail(p + 3) & 0xff) << 24)
        j += 1
      }
      compress(st)
      blk += 64
    }
    // digest bytes 0..3 = A little-endian, 4..7 = B little-endian
    val a = st.a; val b = st.b
    val b0 = a & 0xffL; val b1 = (a >>> 8) & 0xffL
    val b2 = (a >>> 16) & 0xffL; val b3 = (a >>> 24) & 0xffL
    val b4 = b & 0xffL; val b5 = (b >>> 8) & 0xffL
    val b6 = (b >>> 16) & 0xffL; val b7 = (b >>> 24) & 0xffL
    (((((((b0 << 8 | b1) << 8 | b2) << 8 | b3) << 8 | b4) << 8 | b5)
      << 8 | b6) << 4) | (b7 >>> 4)
  }
}
