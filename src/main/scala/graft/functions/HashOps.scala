package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Scalar hashing called from whole-stage codegen via StaticInvoke
  * (the ShingleOps pattern — see Hashing.md5Long for why the
  * conv(substring(md5…)) column chain was replaced).
  */
object HashOps {

  /** First 60 bits of md5(s) as a non-negative long — bit-identical to
    * `java.lang.Long.parseLong(md5Hex(s).take(15), 16)`: hex chars
    * 1..15 are digest bytes 0..6 (56 bits) followed by the high nibble
    * of byte 7. Null input is handled by StaticInvoke's propagateNull.
    * Backed by [[Md5Core]] (direct RFC 1321 over the UTF8String's own
    * bytes, thread-local scratch — no MessageDigest dispatch, input
    * copy, or 16-byte digest allocation per call); HashOpsSpec pins
    * equality against the MessageDigest path across block boundaries.
    */
  def md5Long(s: UTF8String): Long = Md5Core.md5Long60(s)
}
