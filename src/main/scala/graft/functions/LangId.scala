package graft.functions

import java.util.Locale

import org.apache.spark.unsafe.types.UTF8String

/** X9 — statistical language identification: the Cavnar & Trenkle
  * ranked-n-gram-profile method ("N-Gram-Based Text Categorization",
  * SDAIR-94) — the same algorithm behind Tika's LanguageIdentifier,
  * which the reference's language-identifier plugin delegates to.
  *
  * Language profiles are built at load from embedded public-domain
  * sample text (UDHR article 1) plus each language's most frequent
  * function words — no fabricated statistics tables. Classification:
  * build the document's ranked trigram profile and pick the language
  * with the smallest out-of-place distance.
  *
  * Scalar + StaticInvoke entry points; the scalar is cheap enough for
  * per-document codegen calls (profile maps are built once per JVM). */
object LangId {

  private val ProfileSize = 300

  /** Public-domain sample text per language (UDHR art. 1) + high-
    * frequency function words to stabilize the small profile. */
  private val samples: Map[String, String] = Map(
    "en" -> ("All human beings are born free and equal in dignity and " +
      "rights. They are endowed with reason and conscience and should " +
      "act towards one another in a spirit of brotherhood. " +
      "the of and to in is that it was for on are with as be at by this " +
      "have from or had not but what all were when we there can an your " +
      "which their said if will each about how up out them then she many"),
    "de" -> ("Alle Menschen sind frei und gleich an Würde und Rechten " +
      "geboren. Sie sind mit Vernunft und Gewissen begabt und sollen " +
      "einander im Geist der Brüderlichkeit begegnen. " +
      "der die und in den von zu das mit sich des auf für ist im dem " +
      "nicht ein eine als auch es an werden aus er hat dass sie nach wird " +
      "bei einer um am sind noch wie einem über einen so zum war haben"),
    "fr" -> ("Tous les êtres humains naissent libres et égaux en dignité " +
      "et en droits. Ils sont doués de raison et de conscience et doivent " +
      "agir les uns envers les autres dans un esprit de fraternité. " +
      "de la le et les des en un du une que est pour qui dans a par plus " +
      "pas au sur ne se ce il sont la mais comme ou si leur y ont cette " +
      "aux était ses dont avec son elle tout nous sa avoir fait"),
    "es" -> ("Todos los seres humanos nacen libres e iguales en dignidad " +
      "y derechos y, dotados como están de razón y conciencia, deben " +
      "comportarse fraternalmente los unos con los otros. " +
      "de la que el en y a los se del las un por con no una su para es " +
      "al lo como más pero sus le ya o este sí porque esta entre cuando " +
      "muy sin sobre también me hasta hay donde quien desde todo nos"),
    "it" -> ("Tutti gli esseri umani nascono liberi ed eguali in dignità " +
      "e diritti. Essi sono dotati di ragione e di coscienza e devono " +
      "agire gli uni verso gli altri in spirito di fratellanza. " +
      "di e il la che in a per è una un sono le si con non come più da " +
      "ma anche questo della nel alla ha dei gli i suo se lo tutto al " +
      "loro questa quando essere stato sulla fra tra dopo senza"),
    "pt" -> ("Todos os seres humanos nascem livres e iguais em dignidade " +
      "e em direitos. Dotados de razão e de consciência, devem agir uns " +
      "para com os outros em espírito de fraternidade. " +
      "de a o que e do da em um para é com não uma os no se na por mais " +
      "as dos como mas foi ao ele das tem à seu sua ou ser quando muito " +
      "há nos já está eu também só pelo pela até isso ela entre era"),
    "nl" -> ("Alle mensen worden vrij en gelijk in waardigheid en rechten " +
      "geboren. Zij zijn begiftigd met verstand en geweten, en behoren " +
      "zich jegens elkander in een geest van broederschap te gedragen. " +
      "de van het een en in is dat op te zijn met voor niet aan er om " +
      "ook als dan maar bij nog uit naar door over ze zo worden wel geen " +
      "al wordt meer onder tegen deze heeft hun naar werd tussen"))

  /** Ranked trigram profile (index in vector = rank). */
  def profile(text: String, top: Int = ProfileSize): Vector[String] = {
    val counts = scala.collection.mutable.HashMap.empty[String, Int]
    // letters only, lowercase, word-padded with '_'
    val norm = text.toLowerCase(Locale.ROOT)
      .replaceAll("[^\\p{L}]+", " ").trim
    for (w <- norm.split(' ') if w.nonEmpty) {
      val padded = s"_${w}_"
      var i = 0
      while (i + 3 <= padded.length) {
        val g = padded.substring(i, i + 3)
        counts.update(g, counts.getOrElse(g, 0) + 1)
        i += 1
      }
    }
    counts.toVector.sortBy { case (g, c) => (-c, g) }.take(top).map(_._1)
  }

  private lazy val profiles: Map[String, (Vector[String], Map[String, Int])] =
    samples.map { case (lang, s) =>
      val p = profile(s)
      lang -> ((p, p.zipWithIndex.toMap))
    }

  /** Out-of-place distance of a doc profile vs a language profile. */
  private def distance(doc: Vector[String], ranks: Map[String, Int],
      maxRank: Int): Long =
    doc.zipWithIndex.map { case (g, i) =>
      ranks.get(g) match {
        case Some(r) => math.abs(r - i).toLong
        case None => maxRank.toLong
      }
    }.sum

  /** Best-match language code, or "unknown" for texts with no letters.
    * Deterministic tiebreak: smaller distance, then language code. */
  def classify(text: String): String = {
    if (text == null) return "unknown"
    val doc = profile(text)
    if (doc.isEmpty) return "unknown"
    profiles.toVector.map { case (lang, (p, ranks)) =>
      (distance(doc, ranks, p.length), lang)
    }.min._2
  }

  def classifyU(t: UTF8String): UTF8String =
    if (t == null) null else UTF8String.fromString(classify(t.toString))

  /** Codegen'd column (StaticInvoke, no UDF). */
  def classifyCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.types.StringType
    ColumnBridge.column(StaticInvoke(
      Class.forName("graft.functions.LangId"), StringType, "classifyU",
      Seq(ColumnBridge.expression(c)), Seq(StringType)))
  }
}
