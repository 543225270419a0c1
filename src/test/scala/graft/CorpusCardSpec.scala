package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Curation

/** Dataset-card semantics on a hand-computable corpus: counts,
  * entropy, dominant stratum with deterministic tie-break, exact-dup
  * ratio, interpolated percentiles. */
class CorpusCardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 4 docs: en x2 (one exact dup pair), de x1, fr x1; sources a, b
  private val docs = Seq(
    (1L, "same text", "en", "a", 9L),
    (2L, "same text", "en", "a", 9L),
    (3L, "anders", "de", "b", 6L),
    (4L, "autre", "fr", "b", 5L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("card: one row of hand-checked release stats") {
    val r = Curation.corpusCard(docs).collect()
    assert(r.length == 1)
    val m = Curation.corpusCard(docs).columns.zip(r.head.toSeq).toMap
    assert(m("n_docs") == 4L)
    assert(m("total_chars") == 29L)
    assert(m("n_langs") == 3L)
    assert(m("n_sources") == 2L)
    assert(m("avg_chars") == 7.25)
    // sorted lens 5,6,9,9 → p50 = 6 + 0.5*(9-6) = 7.5
    assert(m("p50_chars") == 7.5)
    assert(m("n_distinct_texts") == 3L)
    assert(m("distinct_ratio") == 0.75)
    // mix (0.5, 0.25, 0.25) → H = 1.5 bits
    assert(m("lang_entropy_bits") == 1.5)
    assert(m("top_lang") == "en")
    assert(m("top_lang_share") == 0.5)
  }

  test("dominant-stratum ties break lexicographically") {
    val tied = docs.where("lang <> 'en'") // de x1, fr x1
    val m = Curation.corpusCard(tied).collect().head
      .getValuesMap[Any](Seq("top_lang", "top_lang_share", "lang_entropy_bits"))
    assert(m("top_lang") == "de")
    assert(m("top_lang_share") == 0.5)
    assert(m("lang_entropy_bits") == 1.0)
  }

  test("a single-stratum corpus has zero entropy and share 1.0") {
    val one = docs.where("lang = 'en'")
    val m = Curation.corpusCard(one).collect().head
      .getValuesMap[Any](Seq("lang_entropy_bits", "top_lang_share", "distinct_ratio"))
    assert(m("lang_entropy_bits") == 0.0)
    assert(m("top_lang_share") == 1.0)
    assert(m("distinct_ratio") == 0.5) // the dup pair
  }
}
