package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.BpeTrainer

/** Fertility-report semantics: char-level baseline, merge-driven
  * compression, per-stratum separation, token-count conservation. */
class FertilitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    ("en", "ab ab ab"),
    ("en", "ab cd"),
    ("de", "wxyz wxyz"))
    .toDF("lang", "text")

  test("zero merges: every char is a token, fertility = avg word length") {
    val r = BpeTrainer.fertilityReport(docs, Nil)
      .as[(String, Long, Long, Long, Double, Double)]
      .collect().map(x => x._1 -> x).toMap
    // en: 5 words, 10 chars; de: 2 words, 8 chars
    assert(r("en") == (("en", 5L, 10L, 10L, 2.0, 1.0)))
    assert(r("de") == (("de", 2L, 8L, 8L, 4.0, 1.0)))
  }

  test("learned merges reduce fertility, never token-chars") {
    val merges = BpeTrainer.fit(docs, numMerges = 3)
    assert(merges.nonEmpty)
    val r0 = BpeTrainer.fertilityReport(docs, Nil)
      .as[(String, Long, Long, Long, Double, Double)]
      .collect().map(x => x._1 -> x).toMap
    val r = BpeTrainer.fertilityReport(docs, merges)
      .as[(String, Long, Long, Long, Double, Double)]
      .collect().map(x => x._1 -> x).toMap
    r.foreach { case (k, v) =>
      assert(v._5 <= r0(k)._5, s"fertility rose for $k")
      assert(v._4 == r0(k)._4, s"chars changed for $k") // conserved
      assert(v._2 == r0(k)._2, s"word count changed for $k")
    }
    // "ab" merges fully somewhere: en fertility strictly improves
    assert(r("en")._5 < 2.0)
  }

  test("a fully-merged vocabulary reaches fertility 1.0") {
    val one = Seq(("xx", "ab ab")).toDF("lang", "text")
    val merges = BpeTrainer.fit(one, numMerges = 5)
    val r = BpeTrainer.fertilityReport(one, merges)
      .as[(String, Long, Long, Long, Double, Double)].collect().head
    assert(r._5 == 1.0) // one token per word
    assert(r._6 == 2.0) // two chars per token
  }
}
