package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
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

  /** md5Long of every overlapping w-word window, in position order and
    * KEEPING duplicates — array<long>, entry i = hash of tokens
    * [i, i+w). `posexplode` of it reproduces the (pos, h) rows of the
    * `explode(sequence(0, size(ws)-w)) + md5Long(concat_ws(" ",
    * slice(ws, p+1, w)))` pipeline it replaces — WITHOUT copying the
    * whole token array into every exploded row (the generator retains
    * `ws`, so each of the O(tokens) output rows used to materialize an
    * O(tokens) array: quadratic bytes per document). Fewer than w
    * tokens yields an EMPTY array (the `size(ws) >= w` guard).
    *
    * Zero-copy: `split(text, " ")` keeps empty tokens and rejoining
    * with " " reproduces the original bytes, so the window string IS
    * the byte range of `text` from token i's first byte to token
    * (i+w-1)'s last — each hash runs straight over the document's own
    * buffer (0x20 never occurs inside a UTF-8 multi-byte sequence, so
    * byte-level token splitting is character-exact). */
  def spanHashes(text: UTF8String, w: Int): ArrayData = {
    if (text == null) return null
    val (bytes, off, len) = textBytes(text)
    val starts = tokenStarts(bytes, off, len)
    val m = starts.length - w // = nTokens - w + 1
    if (m < 1)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.emptyLongArray)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      val s = starts(i)
      out(i) = HashOps.md5LongRange(bytes, off + s, starts(i + w) - 1 - s)
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** DISTINCT [[spanHashes]] (first-occurrence order): per-document
    * dedup here ≡ the global `.distinct()` over (doc_id, h) rows it
    * lets callers drop — one Exchange fewer. */
  def spanHashesDistinct(text: UTF8String, w: Int): ArrayData = {
    if (text == null) return null
    val (bytes, off, len) = textBytes(text)
    val starts = tokenStarts(bytes, off, len)
    val m = starts.length - w
    if (m < 1)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[java.lang.Long](m * 2)
    var i = 0
    while (i < m) {
      val s = starts(i)
      seen.add(HashOps.md5LongRange(bytes, off + s, starts(i + w) - 1 - s))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next().longValue(); k += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** md5Long of every NON-overlapping k-word chunk ("line"), in order,
    * keeping duplicates, trailing short chunk included — the scalar
    * twin of the `explode(sequence(0, ceil(size(ws)/k)-1)) +
    * md5Long(concat_ws(" ", slice(ws, line_no*k+1, k)))` line splitter
    * (line_dedup / soft_dedup), minus that form's per-row token-array
    * copy. Every document yields at least one line (split of the empty
    * string is [""], whose single short chunk hashes the empty
    * string — identical to the column form). */
  def lineHashes(text: UTF8String, k: Int): ArrayData = {
    if (text == null) return null
    val (bytes, off, len) = textBytes(text)
    val starts = tokenStarts(bytes, off, len)
    val n = starts.length - 1
    val lines = (n + k - 1) / k
    val out = new Array[Long](lines)
    var j = 0
    while (j < lines) {
      val s = starts(j * k)
      val e = starts(math.min(n, (j + 1) * k)) - 1
      out(j) = HashOps.md5LongRange(bytes, off + s, e - s)
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** Count of NON-EMPTY space-separated tokens — the codegen twin of
    * `split(text, " ")` exploded, filtered `length(w) >= 1`, and
    * counted per document (the BM25 document length dl): equals the
    * number of maximal non-space byte runs, walked straight over the
    * UTF8String's bytes (0x20 never occurs inside a UTF-8 multi-byte
    * sequence). 0 for the empty and all-space strings — callers keep
    * the legacy explode-drop row set with `.where(col > 0)`. */
  def nonEmptyTokens(text: UTF8String): Long = {
    val (bytes, off, len) = textBytes(text)
    var n = 0L
    var inTok = false
    var i = 0
    while (i < len) {
      val sp = bytes(off + i) == ' '
      if (!sp && !inTok) n += 1
      inTok = !sp
      i += 1
    }
    n
  }

  /** 60-bit SimHash of the ≥2-char space-separated tokens of `text` —
    * the row-local twin of `explode(split(text, " ")) +
    * filter(length(tok) >= 2) + md5Long(tok) + groupBy(doc).agg(60 ±1
    * vote sums) + Σ (v_i > 0) << i`. Bit-identical: integer vote sums
    * are order-independent, the per-token hash is the same
    * [[HashOps.md5LongRange]] bytes as md5Long(token), and byte-level
    * token splitting is character-exact (0x20 never occurs inside a
    * UTF-8 multi-byte sequence). Null when no token qualifies — the
    * doc then has no rows in the vote aggregate, i.e. the groupBy-drop
    * semantics callers preserve with `.where(isNotNull)`. */
  def simhash60(text: UTF8String, minChars: Int): java.lang.Long = {
    if (text == null) return null
    val (bytes, off, len) = textBytes(text)
    val starts = tokenStarts(bytes, off, len)
    val n = starts.length - 1
    val votes = new Array[Int](60)
    var any = false
    var j = 0
    while (j < n) {
      val s = starts(j)
      val e = starts(j + 1) - 1 // token bytes are [s, e)
      val bl = e - s
      // character length ≥ minChars: a UTF-8 char is ≤ 4 bytes, so
      // byteLen ≥ 4·minChars−3 always qualifies; below minChars bytes
      // never does; in between, count non-continuation bytes
      val ok =
        if (bl < minChars) false
        else if (bl >= 4 * (minChars - 1) + 1) true
        else {
          var c = 0
          var i = s
          while (i < e) {
            if ((bytes(off + i) & 0xC0) != 0x80) c += 1
            i += 1
          }
          c >= minChars
        }
      if (ok) {
        any = true
        val h = HashOps.md5LongRange(bytes, off + s, bl)
        var i = 0
        while (i < 60) {
          votes(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
          i += 1
        }
      }
      j += 1
    }
    if (!any) return null
    var sh = 0L
    var i = 0
    while (i < 60) {
      if (votes(i) > 0) sh |= 1L << i
      i += 1
    }
    java.lang.Long.valueOf(sh)
  }

  /** Hashed-bag-of-words featurization of ONE document — the row-local
    * twin of the centroid trainer's
    * `explode(split(text, " ")) + filter(length ≥ 1) +
    * pmod(md5Long(tok), nf) + groupBy(doc, y, f).count + bias-row
    * union`: returns struct(y, pairs) where y = ±1 by the
    * `size(split(text, " ")) >= gate` token-count gate (EMPTY tokens
    * counted, exactly like size(split)) and pairs = the (f, count)
    * rows for every occupied bucket plus the trailing (nf, 1) bias
    * pair. Null text reproduces the legacy union semantics: the
    * explode side contributed nothing and the bias side labeled the
    * doc y = −1 (size(null) < gate), so pairs = [(nf, 1)] alone.
    * Pair ORDER is bucket-ascending + bias last — consumers aggregate
    * per f / per doc, so order never reaches any declared result. */
  def centroidFeat(text: UTF8String, nf: Int, gate: Int): InternalRow = {
    if (text == null) {
      return new GenericInternalRow(Array[Any](-1L, new GenericArrayData(
        Array[Any](new GenericInternalRow(Array[Any](nf.toLong, 1L))))))
    }
    val (bytes, off, len) = textBytes(text)
    val starts = tokenStarts(bytes, off, len)
    val n = starts.length - 1
    val y = if (n >= gate) 1L else -1L
    val counts = new Array[Long](nf)
    var nz = 0
    var j = 0
    while (j < n) {
      val s = starts(j)
      val e = starts(j + 1) - 1 // token bytes are [s, e)
      if (e > s) { // length(tok) >= 1
        val f = (HashOps.md5LongRange(bytes, off + s, e - s) % nf).toInt
        if (counts(f) == 0L) nz += 1
        counts(f) += 1L
      }
      j += 1
    }
    val pairs = new Array[Any](nz + 1)
    var k = 0
    var f = 0
    while (f < nf) {
      if (counts(f) > 0L) {
        pairs(k) = new GenericInternalRow(Array[Any](f.toLong, counts(f)))
        k += 1
      }
      f += 1
    }
    pairs(nz) = new GenericInternalRow(Array[Any](nf.toLong, 1L))
    new GenericInternalRow(Array[Any](y, new GenericArrayData(pairs)))
  }

  /** The UTF8String's bytes with zero copies when it is heap-backed
    * (the common case for column data), one copy otherwise. */
  private def textBytes(text: UTF8String): (Array[Byte], Int, Int) =
    text.getBaseObject match {
      case arr: Array[Byte] =>
        (arr, (text.getBaseOffset -
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET).toInt,
          text.numBytes())
      case _ => val b = text.getBytes; (b, 0, b.length)
    }

  /** Byte start offsets of each space-separated token (empties kept —
    * `split(text, " ")` semantics), plus a virtual start one past the
    * end: token j's bytes are [starts(j), starts(j+1) − 1), and the
    * window/chunk joining tokens [a, b) is exactly the byte range
    * [starts(a), starts(b) − 1). */
  private def tokenStarts(bytes: Array[Byte], off: Int, len: Int)
      : Array[Int] = {
    var n = 1
    var i = 0
    while (i < len) { if (bytes(off + i) == ' ') n += 1; i += 1 }
    val starts = new Array[Int](n + 1)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < len) {
      if (bytes(off + i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(n) = len + 1
    starts
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
