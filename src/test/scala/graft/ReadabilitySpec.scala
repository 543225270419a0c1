package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Readability

/** Hand-computed Flesch/FK values under the stated syllable
  * heuristic. */
class ReadabilitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def score(text: String) =
    Readability.report(Seq((1L, text)).toDF("doc_id", "text"))
      .select("n_words", "n_sentences", "n_syllables", "flesch",
        "fk_grade", "band")
      .collect().head

  test("hand case: counts and formulas") {
    // "The cat sat. It ran away!" → 6 words, 2 sentences.
    // vowel runs: the(1) cat(1) sat(1) it(1) ran(1) away(2: a, ay) = 7
    val r = score("The cat sat. It ran away!")
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((6L, 2L, 7L)))
    val wps = 6.0 / 2.0
    val spw = 7.0 / 6.0
    val flesch = BigDecimal(206.835 - 1.015 * wps - 84.6 * spw)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val fk = BigDecimal(0.39 * wps + 11.8 * spw - 15.59)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(3) == flesch && r.getDouble(4) == fk)
    assert(r.getString(5) == "easy")
  }

  test("vowel-less tokens still count one syllable; no terminator means one sentence") {
    // "7 9 xyz" — wait, y is a vowel here; use true vowel-less tokens
    val r = score("7 dr 42")
    assert(r.getLong(0) == 3L)
    assert(r.getLong(1) == 1L, "no [.!?] → one sentence")
    assert(r.getLong(2) == 3L, "max(1, runs) per vowel-less token")
  }

  test("script profile: hand-counted class shares including Cyrillic") {
    // "ab1 Дя" → 6 chars: 2 latin, 1 digit, 2 cyrillic, 1 space
    val d = Seq((1L, "ab1 Дя", "ru"), (2L, "xy", "en"))
      .toDF("doc_id", "text", "source")
    val got = graft.operators.TextQuality.scriptProfile(d)
      .select("source", "n_chars", "latin_share", "digit_share",
        "cyrillic_share", "space_share", "other_share")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    val third = BigDecimal(1.0 / 3).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val sixth = BigDecimal(1.0 / 6).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("ru") == ((6L, third, sixth, third, sixth, 0.0)))
    assert(got("en") == ((2L, 1.0, 0.0, 0.0, 0.0, 0.0)))
  }

  test("empty text bands as empty with null scores") {
    val r = score("   ")
    assert(r.getLong(0) == 0L && r.isNullAt(3) && r.isNullAt(4))
    assert(r.getString(5) == "empty")
  }

  test("dense clause-free prose scores harder than choppy prose") {
    val choppy = score("He ran. She saw. It fell. We went. They sat.")
    val dense = score(
      "Notwithstanding considerable organizational complexity, " +
        "sophisticated multidimensional evaluation methodologies " +
        "necessitate comprehensive interdepartmental coordination.")
    assert(choppy.getDouble(3) > dense.getDouble(3),
      "long polysyllabic sentences must score as harder")
    assert(dense.getString(5) == "difficult")
  }
}
