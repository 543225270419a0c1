package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextLM

class TextLMSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bigram NLL matches a direct computation on a tiny corpus") {
    // d1 = "a b a", d2 = "a c"
    // bigrams: d1 (a,b),(b,a); d2 (a,c)
    // c12 all 1; c1: a→2, b→1; vocab {a,b,c} → V=3; alpha=0.4
    val df = Seq((1L, "a b a"), (2L, "a c")).toDF("doc_id", "text")
    val out = TextLM.perplexityScores(df)
      .select("doc_id", "n_bigrams", "avg_nll", "ppl")
      .as[(Long, Long, Double, Double)].collect().toMap2
    def nll(c12: Double, c1: Double) =
      -math.log((c12 + 0.4) / (c1 + 0.4 * 3)) / math.log(2)
    val d1 = (nll(1, 2) + nll(1, 1)) / 2
    val d2 = nll(1, 2)
    def r(x: Double, p: Int) =
      BigDecimal(x).setScale(p, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == ((2L, r(d1, 4), r(math.pow(2, d1), 3))))
    assert(out(2L) == ((1L, r(d2, 4), r(math.pow(2, d2), 3))))
  }

  test("typical text scores lower perplexity than rare-token text") {
    val common = (1 to 20).map(i => (i.toLong, "the cat sat on the mat"))
    val weird = Seq((100L, "zyx qwv jkl pqr mno vwx"))
    val out = TextLM.perplexityScores((common ++ weird).toDF("doc_id", "text"))
      .select("doc_id", "ppl").as[(Long, Double)].collect().toMap
    assert(out(1L) < out(100L),
      s"boilerplate ppl ${out(1L)} should be below gibberish ppl ${out(100L)}")
  }

  test("model pruning (minCount) keeps every doc scored, scores only coarsen") {
    val docs = Seq(
      (1L, "x y x y x y"),
      (2L, "x y z q r s"),
      (3L, "a")).toDF("doc_id", "text") // doc 3: 1 token → excluded
    val exact = TextLM.perplexityScores(docs)
    val pruned = TextLM.perplexityScores(docs, minCount = 3L)
    assert(exact.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    assert(pruned.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    // pruning removes observed mass, so NLL can only rise
    val e = exact.select("doc_id", "avg_nll").as[(Long, Double)].collect().toMap
    val p = pruned.select("doc_id", "avg_nll").as[(Long, Double)].collect().toMap
    assert(e.forall { case (id, v) => p(id) >= v - 1e-9 })
  }

  private implicit class Map2[A, B, C, D](rows: Array[(A, B, C, D)]) {
    def toMap2: Map[A, (B, C, D)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }
}
