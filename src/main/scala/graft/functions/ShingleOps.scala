package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Scalar shingling over UTF8String, called from whole-stage codegen via
  * StaticInvoke (see Similarity.shingleCall for why the HOF column form
  * was replaced). Semantics are byte-exact with the column expressions
  * they replace:
  *
  *   - charShingles(text, n): every character n-gram (UTF8String
  *     character semantics, = `substr(i, n)`), deduped keeping first
  *     occurrence; a string shorter than n yields [text].
  *   - wordShingles(text, w): split on single spaces KEEPING empty
  *     tokens (= `split(text, " ")` with limit −1), then every w-token
  *     window joined by one space (= `concat_ws`), deduped; fewer than
  *     w tokens yields [tokens joined by space].
  */
object ShingleOps {

  private val Space = UTF8String.fromString(" ")

  def charShingles(text: UTF8String, n: Int): ArrayData = {
    if (text == null) return null
    val len = text.numChars()
    if (len < n) return new GenericArrayData(Array[Any](text))
    val seen = new java.util.LinkedHashSet[UTF8String](len * 2)
    var i = 0
    val last = len - n
    while (i <= last) {
      // substringSQL is 1-based and character-aware — identical to the
      // Column.substr the HOF form used
      seen.add(text.substringSQL(i + 1, n))
      i += 1
    }
    toArrayData(seen)
  }

  def wordShingles(text: UTF8String, w: Int): ArrayData = {
    if (text == null) return null
    // UTF8String.split with limit -1 = the split() column function:
    // consecutive separators produce empty tokens, trailing kept
    val tokens = text.split(Space, -1)
    if (tokens.length < w)
      return new GenericArrayData(
        Array[Any](UTF8String.concatWs(Space, tokens: _*)))
    val seen = new java.util.LinkedHashSet[UTF8String](tokens.length * 2)
    var i = 0
    val last = tokens.length - w
    val window = new Array[UTF8String](w)
    while (i <= last) {
      var o = 0
      while (o < w) { window(o) = tokens(i + o); o += 1 }
      seen.add(UTF8String.concatWs(Space, window: _*))
      i += 1
    }
    toArrayData(seen)
  }

  /** Word n-grams KEEPING duplicates and order — the scalar twin of
    * the `posexplode(split) → lead(w, j).over(doc window) → concat_ws`
    * pipeline (same multiset of grams per document), minus that form's
    * Exchange + Sort + WindowExec over every corpus token. Fewer than
    * n tokens yields an EMPTY array (the `lead IS NOT NULL` filter's
    * semantics — NOT wordShingles' whole-text fallback). */
  def wordGramsAll(text: UTF8String, n: Int): ArrayData = {
    if (text == null) return null
    val tokens = text.split(Space, -1)
    if (tokens.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](tokens.length - n + 1)
    val window = new Array[UTF8String](n)
    var i = 0
    val last = tokens.length - n
    while (i <= last) {
      var o = 0
      while (o < n) { window(o) = tokens(i + o); o += 1 }
      out(i) = UTF8String.concatWs(Space, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Deduped word n-grams with [[wordGramsAll]]'s short-doc semantics
    * (EMPTY below n tokens, where wordShingles falls back to the whole
    * text) — the decontamination gram unit (QueriesPipeline.wordGrams8).
    */
  def wordGramsDistinct(text: UTF8String, n: Int): ArrayData = {
    if (text == null) return null
    val tokens = text.split(Space, -1)
    if (tokens.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](tokens.length * 2)
    val window = new Array[UTF8String](n)
    var i = 0
    val last = tokens.length - n
    while (i <= last) {
      var o = 0
      while (o < n) { window(o) = tokens(i + o); o += 1 }
      seen.add(UTF8String.concatWs(Space, window: _*))
      i += 1
    }
    toArrayData(seen)
  }

  /** Winnowing fingerprint selection (Schleimer et al., SIGMOD 2003)
    * fully in one scalar: hash every n-word gram with
    * [[HashOps.md5Long]] (bit-identical to the column md5Long), slide
    * a window of `win` consecutive gram hashes, keep each window's
    * minimum, return the DISTINCT selected hashes. Replaces the two
    * stacked per-doc windows (gram lead()s + min-over-win) the query
    * used — same set per document; fewer than `win` grams yields an
    * empty array (the old `lead(h, win-1) IS NOT NULL` filter). */
  def winnowMins(text: UTF8String, n: Int, win: Int): ArrayData = {
    if (text == null) return null
    val tokens = text.split(Space, -1)
    val m = tokens.length - n + 1
    if (m < win) return new GenericArrayData(Array.empty[Any])
    val hs = new Array[Long](m)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i < m) {
      var o = 0
      while (o < n) { window(o) = tokens(i + o); o += 1 }
      hs(i) = HashOps.md5Long(UTF8String.concatWs(Space, window: _*))
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long](m * 2)
    var p = 0
    val lastWin = m - win
    while (p <= lastWin) {
      var mn = hs(p)
      var j = 1
      while (j < win) { val v = hs(p + j); if (v < mn) mn = v; j += 1 }
      seen.add(mn)
      p += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next().longValue(); k += 1 }
    // primitive array — GenericArrayData(Array[Any]) would box
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  private def toArrayData(seen: java.util.LinkedHashSet[UTF8String])
      : ArrayData = {
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}
