package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.UnicodeNormalize.unicodeNormalize
import graft.operators.Scrub

/** Unicode-normalization semantics: composed/decomposed unification,
  * compatibility folding, ASCII identity fast path, SQL registration,
  * and the downstream-hash motivation (dedup sees one doc, not two). */
class UnicodeNormalizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val composed = "café"           // é as U+00E9
  private val decomposed = "café"        // e + combining acute

  test("NFC unifies composed and decomposed forms") {
    val out = Seq(composed, decomposed).toDF("t")
      .select(unicodeNormalize(col("t"), "NFC").as("n"))
      .as[String].collect()
    assert(out(0) == out(1))
    assert(out(0) == composed)
  }

  test("NFKC folds compatibility variants (full-width ASCII)") {
    val fullWidth = "ＡＢＣ" // ＡＢＣ
    val out = Seq(fullWidth).toDF("t")
      .select(unicodeNormalize(col("t"), "NFKC").as("n"))
      .as[String].collect().head
    assert(out == "ABC")
    // NFC deliberately does NOT fold compatibility forms
    val nfc = Seq("Ａ").toDF("t")
      .select(unicodeNormalize(col("t"), "NFC").as("n"))
      .as[String].collect().head
    assert(nfc == "Ａ")
  }

  test("clean ASCII passes through unchanged; nulls stay null") {
    val out = Seq(Some("plain ascii"), None).toDF("t")
      .select(unicodeNormalize(col("t"), "NFC").as("n"))
      .collect()
    assert(out(0).getString(0) == "plain ascii")
    assert(out(1).isNullAt(0))
  }

  test("an unknown form is rejected at construction") {
    val e = intercept[IllegalArgumentException] {
      unicodeNormalize(col("t"), "NFX")
    }
    assert(e.getMessage.contains("NFX"))
  }

  test("normalizeText makes exact dedup see one document, not two") {
    val docs = Seq(
      (1L, s"The $composed menu"),
      (2L, s"the  $decomposed menu")) // case + ws + form differences
      .toDF("doc_id", "text")
    val norm = Scrub.normalizeText(docs)
      .as[(Long, String, Boolean)].collect()
    assert(norm(0)._2 == norm(1)._2)
    assert(norm.forall(_._3)) // both rows were rewritten
    val distinctTexts = Scrub.normalizeText(docs)
      .select("text_norm").distinct().count()
    assert(distinctTexts == 1L)
  }

  test("the SQL registration works end-to-end") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      s"SELECT unicode_normalize('$decomposed', 'NFC') AS n")
      .as[String].collect().head
    assert(got == composed)
  }
}
