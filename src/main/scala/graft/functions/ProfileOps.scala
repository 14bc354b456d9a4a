package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document profile scalars called from whole-stage codegen via
  * StaticInvoke (the ShingleOps pattern) — each collapses an
  * explode → wide-aggregate (or explode → join → window → collect)
  * subtree into one row-local pass with bit-identical results.
  */
object ProfileOps {

  private val P = Similarity.MinhashP
  // one source of truth for the affine family (Similarity.minhashA/B)
  private val A = Array.tabulate(32)(Similarity.minhashA)
  private val B = Array.tabulate(32)(Similarity.minhashB)

  /** MinHash profile of a shingle array: (hbs, n, ms) where
    * hbs(i) = md5Long(shingle_i) mod P (order-preserving, duplicates
    * kept — the collect_list twin), n = shingle count, and
    * ms(j) = min_i (A_j·hbs(i) + B_j) mod P — exactly
    * Similarity.minhashBase + minhashAgg per family member, without
    * shuffling one row per shingle into a 14-aggregate groupBy.
    * Null/empty shingles → null (the explode-drops-the-doc semantics).
    */
  def minhashProfile(shingles: ArrayData, h: Int): InternalRow = {
    require(h <= A.length,
      s"minhashProfile supports at most ${A.length} hash family members" +
        s" (got h=$h); enlarge the tabulated A/B tables to raise it")
    if (shingles == null) return null
    val n = shingles.numElements()
    if (n == 0) return null
    val hbs = new Array[Long](n)
    val ms = new Array[Long](h)
    java.util.Arrays.fill(ms, Long.MaxValue)
    var i = 0
    while (i < n) {
      val hb = HashOps.md5Long(shingles.getUTF8String(i)) % P
      hbs(i) = hb
      var j = 0
      while (j < h) {
        val v = (hb * A(j) + B(j)) % P
        if (v < ms(j)) ms(j) = v
        j += 1
      }
      i += 1
    }
    // fromPrimitiveArray, NOT GenericArrayData(Array[Long]) — the
    // latter BOXES every element (measured: a 64k-shingle doc's hbs
    // boxed 64k Longs; across ngram_jaccard's corpus that was 320M
    // allocations and a 4× wall regression at flat CPU, pure GC)
    new GenericInternalRow(Array[Any](
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(hbs),
      n.toLong,
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(ms)))
  }

  /** Ascending-sorted copy of a long array — applied once per document
    * (at profile build / cache time) so the pairwise verify can merge
    * instead of hash-joining. Sorting is set-preserving, so any
    * set-semantics consumer (array_intersect, the merge counter below)
    * is unaffected. */
  def sortedLongs(a: ArrayData): ArrayData = {
    if (a == null) return null
    val xs = a.toLongArray()
    java.util.Arrays.sort(xs)
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(xs)
  }

  /** |distinct(a) ∩ distinct(b)| of two ASCENDING-SORTED long arrays
    * (duplicates tolerated — each common value counts once): the exact
    * twin of `size(array_intersect(a, b))`, as one allocation-free merge
    * over the unsafe arrays instead of a per-pair hash-set build plus a
    * materialized intersection array. O(|a|+|b|) like the hash form but
    * with no per-element insert/probe or boxing; the per-doc sort that
    * enables it runs once per document, not once per candidate pair. */
  def interCountSorted(a: ArrayData, b: ArrayData): Long = {
    if (a == null || b == null) return 0L
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var count = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else {
        count += 1L
        // skip duplicates of the matched value on both sides
        i += 1
        while (i < na && a.getLong(i) == x) i += 1
        j += 1
        while (j < nb && b.getLong(j) == x) j += 1
      }
    }
    count
  }

  /** ExactSubstr span removal for ONE document from its duplicated
    * window START positions (sorted or not, duplicates tolerated):
    * token pos is covered iff some start lies in [pos-(W-1), pos] —
    * i.e. starts cover [s, s+W-1]. Returns (n_tokens, n_removed,
    * clean_text = uncovered tokens in order, space-joined) — the
    * row-local twin of the old toks-join + MAX-over-ROWS-window +
    * sorted-collect rebuild. Null starts = no duplicated windows. */
  def cutSpans(text: UTF8String, starts: ArrayData, w: Int): InternalRow = {
    if (text == null) return null
    val tokens = text.split(UTF8String.fromString(" "), -1)
    val n = tokens.length
    val covered = new Array[Boolean](n)
    if (starts != null) {
      var i = 0
      val ns = starts.numElements()
      while (i < ns) {
        val s = starts.getInt(i)
        var p = if (s < 0) 0 else s
        val end = math.min(n - 1, s + w - 1)
        while (p <= end) { covered(p) = true; p += 1 }
        i += 1
      }
    }
    var removed = 0L
    var kept = 0
    var i = 0
    while (i < n) {
      if (covered(i)) removed += 1L else kept += 1
      i += 1
    }
    val keptArr = new Array[UTF8String](kept)
    var k = 0
    i = 0
    while (i < n) {
      if (!covered(i)) { keptArr(k) = tokens(i); k += 1 }
      i += 1
    }
    val clean = UTF8String.concatWs(UTF8String.fromString(" "), keptArr: _*)
    new GenericInternalRow(Array[Any](n.toLong, removed, clean))
  }
}
