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

  private def toArrayData(seen: java.util.LinkedHashSet[UTF8String])
      : ArrayData = {
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}
