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
