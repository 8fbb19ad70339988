package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Behavioral pin for the language-ID heuristic: real sentences in each
  * supported language classify correctly, inflected forms are carried by
  * the character-trigram half (no whole dictionary word present), and
  * signal-free input is `und`, never a guess.
  */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  private def idOf(texts: (String, String)*): Seq[(String, String, String)] =
    texts.toSeq.toDF("expected", "text")
      .withColumn("got", TextAnalysis.langId(col("text")))
      .select("expected", "text", "got")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq

  test("real sentences in all six languages classify correctly") {
    val results = idOf(
      "en" -> "the quick brown fox jumps over the lazy dog and runs to the river",
      "en" -> "this is a test of the system that it should pass with no errors",
      "de" -> "der schnelle braune fuchs springt über den faulen hund und läuft zum fluss",
      "de" -> "das ist ein test des systems der mit keinem fehler bestehen sollte",
      "fr" -> "le renard brun rapide saute par dessus le chien paresseux et court vers la rivière",
      "fr" -> "ceci est un test du système qui ne doit pas échouer avec des erreurs",
      "es" -> "el rápido zorro marrón salta sobre el perro perezoso y corre hacia el río",
      "es" -> "esta es una prueba del sistema que no debe fallar con errores",
      "it" -> "la rapida volpe marrone salta sopra il cane pigro e corre verso il fiume",
      "it" -> "questo è un test del sistema che non deve fallire con degli errori",
      "pt" -> "a rápida raposa marrom salta sobre o cão preguiçoso e corre para o rio",
      "pt" -> "este é um teste do sistema que não deve falhar com os erros")
    val wrong = results.filter { case (exp, _, got) => exp != got }
    assert(wrong.isEmpty, s"misclassified: ${wrong.map(w => s"'${w._2}' ${w._1}->${w._3}").mkString("; ")}")
  }

  test("no signal -> und; empty and whitespace -> und") {
    val results = idOf(
      "und" -> "12345 67890 ### @@@",
      "und" -> "",
      "und" -> "   ",
      "und" -> "zzzz qqqq kkkk")
    val wrong = results.filter { case (exp, _, got) => exp != got }
    assert(wrong.isEmpty, s"phantom language: ${wrong.map(w => s"'${w._2}' -> ${w._3}").mkString("; ")}")
  }

  test("trigram profiles carry inflected forms with no exact dictionary word") {
    // German compound/inflected: "einem", "nachdem" contain dictionary
    // trigrams (ein, nach, dem) without equaling any dictionary word
    val results = idOf("de" -> "einem nachdem über seinem für deinem")
    assert(results.forall { case (exp, _, got) => exp == got },
      s"inflected German misread: ${results.head._3}")
  }

  test("the id is stable under truncation: only the first 512 chars matter") {
    val longText = ("the and of to is in that it with for " * 20) + ("der die das " * 500)
    val r = idOf("en" -> longText)
    assert(r.head._3 == "en", "classification must use the 512-char prefix")
  }
}
