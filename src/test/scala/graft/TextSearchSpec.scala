package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextSearch

class TextSearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark spark streaming engine"),
    (2L, "spark batch engine for big data"),
    (3L, "unrelated words entirely here"),
    (4L, "spark")
  ).toDF("doc_id", "text")

  /** Driver-side BM25 reference over the same fixture. */
  private def refBm25(terms: Seq[String], k1: Double = 1.2, b: Double = 0.75):
      Map[Long, Double] = {
    val corpus = Map(
      1L -> Seq("spark", "spark", "streaming", "engine"),
      2L -> Seq("spark", "batch", "engine", "for", "big", "data"),
      3L -> Seq("unrelated", "words", "entirely", "here"),
      4L -> Seq("spark"))
    val n = corpus.size.toDouble
    val avgdl = corpus.values.map(_.size).sum.toDouble / n
    val dfs = terms.map(t => t -> corpus.values.count(_.contains(t)).toDouble).toMap
    corpus.flatMap { case (id, toks) =>
      val score = terms.map { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0) 0.0
        else {
          val idf = math.log((n - dfs(t) + 0.5) / (dfs(t) + 0.5) + 1.0)
          idf * tf * (k1 + 1.0) /
            (tf + k1 * (1.0 - b + b * toks.size / avgdl))
        }
      }.sum
      if (score > 0) Some(id -> BigDecimal(score)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      else None
    }
  }

  test("bm25 matches the hand-rolled reference scores") {
    val got = TextSearch.bm25(docs, Seq("spark", "batch"))
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got == refBm25(Seq("spark", "batch")))
  }

  test("bm25 ranks the short all-match doc above long partial matches") {
    // doc 4 is a single-token exact hit: highest per-term density
    val top = TextSearch.bm25(docs, Seq("spark"))
      .as[(Long, Long, Double)].collect().head
    assert(top._1 == 4L)
  }

  test("n_terms counts distinct matched query terms") {
    val got = TextSearch.bm25(docs, Seq("spark", "batch", "data"))
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(got(2L) == 3L && got(1L) == 1L && got(4L) == 1L)
    assert(!got.contains(3L))
  }

  test("tfIdf emits per-term weights only for matches") {
    val got = TextSearch.tfIdf(docs, Seq("spark", "batch"))
      .as[(Long, String, Long, Double)].collect().toSeq
    val sparkDf = 3.0; val n = 4.0
    val expectedTfIdf1 = BigDecimal(2.0 * math.log(n / sparkDf))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.contains((1L, "spark", 2L, expectedTfIdf1)))
    assert(got.count(_._2 == "batch") == 1)
    assert(!got.exists(_._1 == 3L))
  }
}
