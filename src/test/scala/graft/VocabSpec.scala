package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Vocab

class VocabSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "en", "the cat sat on the mat"),
    (2L, "en", "the dog sat"),
    (3L, "de", "der hund und der katze"))
    .toDF("doc_id", "lang", "text")

  test("vocab: deterministic rank, tf/df counts, cumulative share") {
    val got = Vocab.build(docs, minCount = 2L, topK = 10)
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    // corpus = 14 tokens; tf>=2: the(3), der(2), sat(2); ties break by token asc
    assert(got == Seq(
      ("the", 3L, 2L, 1L, 0.214286),
      ("der", 2L, 1L, 2L, 0.357143),
      ("sat", 2L, 2L, 3L, 0.5)))
    // topK truncates below the threshold set
    assert(Vocab.build(docs, minCount = 2L, topK = 2).count() == 2)
  }

  test("oov report: per-group token coverage against the built vocab") {
    val vocab = Vocab.build(docs, minCount = 2L, topK = 10)
    val got = Vocab.oovReport(docs, vocab)
      .as[(String, Long, Long, Double)].collect().toSeq
    // de: 5 tokens, 'der' x2 in vocab → 3 OOV; en: 9 tokens,
    // the(3)+sat(2)=5 in vocab → 4 OOV
    assert(got == Seq(
      ("de", 5L, 3L, 0.6),
      ("en", 9L, 4L, 0.444444)))
  }
}
