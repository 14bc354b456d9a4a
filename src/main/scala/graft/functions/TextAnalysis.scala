package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-data-pipeline surface: token
  * counting, language-ID heuristics, quality scoring (BASELINE.json
  * north-star ops; reference analogs: language-identifier plugin,
  * scoring-similarity Model.java).
  *
  * All column-expression based — whole-stage codegen, no UDFs.
  */
object TextAnalysis {

  /** Scalar md5 hex (signature computation in executor-side closures —
    * MD5Signature/TextMD5Signature analog). */
  def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  def distinctTokenCount(text: Column): Column =
    size(array_distinct(tokens(text))).cast("long")

  /** Count of matches of a marker-word alternation (language-ID /
    * stopword-ratio building block). */
  def markerHits(text: Column, words: Seq[String]): Column =
    size(regexp_extract_all(text, lit("\\b(" + words.mkString("|") + ")\\b")))
      .cast("long")

  /** Marker lexicons per language — tiny n-gram-heuristic stand-ins for a
    * real profile model (language-identifier plugin analog). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "fr" -> Seq("le", "la", "et", "de", "est"))

  /** Predicted language: argmax of marker hits with a fixed tiebreak
    * (registration order; strict > so earlier languages win ties). */
  def predictLang(text: Column): Column = {
    val hits = langMarkers.map { case (l, ws) => l -> markerHits(text, ws) }
    hits.tail.foldLeft(
      (lit(langMarkers.head._1), hits.head._2)) {
        case ((bestLang, bestHits), (l, h)) =>
          (when(h > bestHits, lit(l)).otherwise(bestLang),
           when(h > bestHits, h).otherwise(bestHits))
      }._1
  }

  /** Deterministic quality score in basis points [0,10000] from length +
    * stopword ratios — linear blend, floor of a deterministic double (no
    * transcendentals, no round-at-half-boundary: engine-exact). */
  def qualityScoreBp(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val stopRatio = markerHits(text, langMarkers.head._2).cast("double") / nTok
    val lenScore = least(nTok / 100.0, lit(1.0))
    val meanLen = length(text).cast("double") / nTok
    val lenOk = least(meanLen / 10.0, lit(1.0))
    floor((stopRatio * 0.5 + lenScore * 0.3 + lenOk * 0.2) * 10000).cast("long")
  }
}
