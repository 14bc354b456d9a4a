package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Scalar hashing called from whole-stage codegen via StaticInvoke
  * (the ShingleOps pattern — see Hashing.md5Long for why the
  * conv(substring(md5…)) column chain was replaced).
  */
object HashOps {

  // MessageDigest is stateful; one instance per executor thread.
  // digest(bytes) resets the instance, so reuse is safe.
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(s) as a non-negative long — bit-identical to
    * `java.lang.Long.parseLong(md5Hex(s).take(15), 16)`: hex chars
    * 1..15 are digest bytes 0..6 (56 bits) followed by the high nibble
    * of byte 7. Null input is handled by StaticInvoke's propagateNull.
    */
  def md5Long(s: UTF8String): Long = {
    val digest = mdLocal.get().digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
    (v << 4) | ((digest(7) & 0xf0L) >>> 4)
  }
}
