package graft.functions

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** BPE token-array scalars called from whole-stage codegen via
  * StaticInvoke (r15). A word's token sequence is word-local state, so
  * the per-merge work — pair listing and greedy merge application —
  * runs row-locally over a token ARRAY column instead of the r14 form
  * that exploded one row per token and ran 5 window functions + a
  * row_number re-rank per merge pass. Exactness referee: BpeDsirSpec's
  * scalar Sennrich A/B (depth 40 / batched depth 128) and the greedy
  * overlap-parity test pin these semantics.
  */
object BpeOps {

  private val End = UTF8String.fromString("</w>")

  /** Initial token sequence of a word: its characters (UTF8 char
    * semantics, = substr(i, 1)) followed by the `</w>` terminal. */
  def initToks(word: UTF8String): ArrayData = {
    if (word == null) return null
    val n = word.numChars()
    val out = new Array[Any](n + 1)
    var i = 0
    while (i < n) { out(i) = word.substringSQL(i + 1, 1); i += 1 }
    out(n) = End
    new GenericArrayData(out)
  }

  /** All adjacent token pairs (overlaps included — the election counts
    * "aaa" as two (a,a) occurrences, the lead()-window semantics). */
  def adjacentPairs(toks: ArrayData): ArrayData = {
    if (toks == null) return null
    val n = toks.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var prev = toks.getUTF8String(0)
    var i = 0
    while (i < n - 1) {
      val next = toks.getUTF8String(i + 1)
      out(i) = new GenericInternalRow(Array[Any](prev, next))
      prev = next
      i += 1
    }
    new GenericArrayData(out)
  }

  /** One greedy left-to-right sweep applying a batch of pairwise-
    * DISJOINT merges (distinct lfts, no shared token across pairs —
    * bpeLoop's election guarantees it; a single frozen merge is the
    * batch-of-one case). Greedy-with-skip reproduces the r14 run-start
    * cumsum + parity algebra exactly: within a run of consecutive
    * matches of one pair, positions at even offset from the run start
    * merge and the following position is consumed. */
  def applyMerges(toks: ArrayData, lfts: ArrayData,
      rgts: ArrayData): ArrayData = {
    if (toks == null) return null
    val n = toks.numElements()
    val np = if (lfts == null) 0 else lfts.numElements()
    if (n < 2 || np == 0) return toks
    val ls = new Array[UTF8String](np)
    val rs = new Array[UTF8String](np)
    var j = 0
    while (j < np) {
      ls(j) = lfts.getUTF8String(j)
      rs(j) = rgts.getUTF8String(j)
      j += 1
    }
    val ts = new Array[UTF8String](n)
    var i = 0
    while (i < n) { ts(i) = toks.getUTF8String(i); i += 1 }
    val out = new Array[Any](n)
    var k = 0
    i = 0
    while (i < n) {
      var merged: UTF8String = null
      if (i + 1 < n) {
        var p = 0
        while (merged == null && p < np) {
          if (ts(i).equals(ls(p)) && ts(i + 1).equals(rs(p)))
            merged = UTF8String.concat(ls(p), rs(p))
          p += 1
        }
      }
      if (merged != null) { out(k) = merged; k += 1; i += 2 }
      else { out(k) = ts(i); k += 1; i += 1 }
    }
    new GenericArrayData(java.util.Arrays.copyOf(
      out.asInstanceOf[Array[AnyRef]], k))
  }
}
