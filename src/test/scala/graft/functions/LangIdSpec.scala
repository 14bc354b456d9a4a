package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** X9 statistical language-ID (Cavnar–Trenkle ranked trigram
  * profiles). Test sentences are disjoint from the profile sources. */
class LangIdSpec extends AnyFunSuite {

  private val sentences = Seq(
    "en" -> ("the quick brown fox jumps over the lazy dog and then it " +
      "runs away through the green forest with all of the other animals"),
    "de" -> ("der schnelle braune fuchs springt über den faulen hund und " +
      "läuft dann durch den grünen wald mit allen anderen tieren davon"),
    "fr" -> ("le renard brun et rapide saute par dessus le chien paresseux " +
      "et il court ensuite dans la forêt verte avec tous les autres animaux"),
    "es" -> ("el rápido zorro marrón salta sobre el perro perezoso y luego " +
      "corre por el bosque verde con todos los otros animales"),
    "it" -> ("la rapida volpe marrone salta sopra il cane pigro e poi " +
      "corre attraverso il bosco verde con tutti gli altri animali"),
    "pt" -> ("a rápida raposa marrom pula sobre o cachorro preguiçoso e " +
      "depois corre pela floresta verde com todos os outros animais"),
    "nl" -> ("de snelle bruine vos springt over de luie hond en rent " +
      "daarna weg door het groene bos met alle andere dieren"))

  test("each test sentence classifies to its language") {
    for ((lang, s) <- sentences)
      assert(LangId.classify(s) == lang, s"'$s'")
  }

  test("degenerate inputs") {
    assert(LangId.classify(null) == "unknown")
    assert(LangId.classify("12345 !!! ???") == "unknown")
    assert(LangId.classify("") == "unknown")
  }

  test("profile is ranked by frequency with deterministic ties") {
    val p = LangId.profile("aaa aaa aaa bbb")
    // _aa/aaa/aa_ each occur 3×, beat bbb's 1×; ties break alphabetically
    assert(p.take(3) == Vector("_aa", "aa_", "aaa"))
    assert(p.contains("bbb"))
  }

  test("classification is deterministic") {
    val s = sentences.head._2
    assert((1 to 5).map(_ => LangId.classify(s)).distinct.size == 1)
  }
}
