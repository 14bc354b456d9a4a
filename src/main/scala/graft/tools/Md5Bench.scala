package graft.tools

import org.apache.spark.unsafe.types.UTF8String

/** Driver-side microbench for the md5Long backends, on shingle-sized
  * (5 B) and window-sized (~100 B) inputs; no Spark session — pure
  * scalar cost. This is the measurement that REJECTED a hand-rolled
  * RFC 1321 core in r15 (HotSpot intrinsifies MD5's compression, so
  * pure-JVM code loses: 205 vs 135 ns/call at 5 B) and picked the
  * thread-local + zero-copy-update MessageDigest form HashOps ships.
  * Usage: runMain graft.tools.Md5Bench [n]
  */
object Md5Bench {
  private def mdLong(s: UTF8String): Long = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
    (v << 4) | ((digest(7) & 0xf0L) >>> 4)
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 5000000
    val shingles = Array.tabulate(1024)(i =>
      UTF8String.fromString(f"s$i%04d!"))
    val windows = Array.tabulate(1024)(i =>
      UTF8String.fromString(
        (0 until 15).map(j => s"w${(i * 31 + j) % 997}").mkString(" ")))
    def time(label: String, f: UTF8String => Long,
        data: Array[UTF8String]): Unit = {
      var sink = 0L
      // warmup
      var i = 0
      while (i < 2000000) { sink ^= f(data(i & 1023)); i += 1 }
      val t0 = System.nanoTime()
      i = 0
      while (i < n) { sink ^= f(data(i & 1023)); i += 1 }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$label%-28s ${dt}%.3f s  (${dt / n * 1e9}%.1f ns/call, sink=$sink)")
    }
    val tl = new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }
    def tlLong(s: UTF8String): Long = {
      val digest = tl.get().digest(s.getBytes)
      var v = 0L
      var i = 0
      while (i < 7) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
      (v << 4) | ((digest(7) & 0xf0L) >>> 4)
    }
    def tlZeroCopy(s: UTF8String): Long = {
      val d = tl.get()
      s.getBaseObject match {
        case arr: Array[Byte] =>
          d.update(arr,
            (s.getBaseOffset - org.apache.spark.unsafe.Platform
              .BYTE_ARRAY_OFFSET).toInt, s.numBytes())
        case _ => d.update(s.getBytes)
      }
      val digest = d.digest()
      var v = 0L
      var i = 0
      while (i < 7) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
      (v << 4) | ((digest(7) & 0xf0L) >>> 4)
    }
    time("getInstance   5B", mdLong, shingles)
    time("threadlocal   5B", tlLong, shingles)
    time("tl zero-copy  5B", tlZeroCopy, shingles)
    time("current       5B", graft.functions.HashOps.md5Long, shingles)
    time("getInstance   ~100B", mdLong, windows)
    time("threadlocal   ~100B", tlLong, windows)
    time("tl zero-copy  ~100B", tlZeroCopy, windows)
    time("current       ~100B", graft.functions.HashOps.md5Long, windows)
  }
}
