package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RetrievalEval

/** Retrieval metrics on a hand-built corpus where the ideal ranking
  * is known: perfect retrieval scores 1.0 across the board, a
  * no-relevant query scores 0, and a mixed case matches hand-computed
  * MRR/nDCG. */
class RetrievalEvalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 2-dim embeddings: label 0 clusters near (1, 0), label 1 near
  // (0, 1) — cosine retrieves own-cluster first, so label relevance
  // is perfectly separable
  private def clustered() = {
    val l0 = (0 until 4).map(i =>
      (i.toLong, Seq(1.0f, 0.01f * i), 0))
    val l1 = (4 until 8).map(i =>
      (i.toLong, Seq(0.01f * i, 1.0f), 1))
    (l0 ++ l1).toDF("vec_id", "embedding", "label")
  }

  test("separable clusters: P@3 = MRR = nDCG = 1 for every query") {
    val m = RetrievalEval.bruteMetrics(clustered(), nQueries = 8, k = 3)
      .collect()
    assert(m.length == 8)
    m.foreach { r =>
      assert(r.getAs[Double]("p_at_k") == 1.0, r.toString)
      assert(r.getAs[Double]("mrr") == 1.0, r.toString)
      assert(r.getAs[Double]("ndcg") == 1.0, r.toString)
      assert(r.getAs[Long]("n_rel") == 3L)
    }
  }

  test("a query whose label is unique scores 0 with n_rel 0") {
    val df = Seq(
      (0L, Seq(1.0f, 0.0f), 9), // lone label
      (1L, Seq(0.9f, 0.1f), 1),
      (2L, Seq(0.8f, 0.2f), 1),
      (3L, Seq(0.7f, 0.3f), 1))
      .toDF("vec_id", "embedding", "label")
    val r = RetrievalEval.bruteMetrics(df, nQueries = 1, k = 3)
      .collect()(0)
    assert(r.getAs[Long]("n_rel") == 0L)
    assert(r.getAs[Double]("p_at_k") == 0.0)
    assert(r.getAs[Double]("mrr") == 0.0)
    assert(r.getAs[Double]("ndcg") == 0.0)
  }

  test("hand-computed mixed ranking: relevant at ranks 2 and 3 of k=3") {
    // query 0 (label 5). neighbors by cosine: 1 (label 9), then 2 and
    // 3 (label 5). rel pattern = (0, 1, 1).
    val df = Seq(
      (0L, Seq(1.0f, 0.0f), 5),
      (1L, Seq(0.99f, 0.01f), 9), // nearest, irrelevant
      (2L, Seq(0.9f, 0.1f), 5),
      (3L, Seq(0.8f, 0.2f), 5))
      .toDF("vec_id", "embedding", "label")
    val r = RetrievalEval.bruteMetrics(df, nQueries = 1, k = 3)
      .collect()(0)
    assert(math.abs(r.getAs[Double]("p_at_k") - 2.0 / 3) < 1e-6)
    assert(r.getAs[Double]("mrr") == 0.5) // first relevant at rank 2
    // dcg = 1/log2(3) + 1/log2(4); idcg at min(n_rel=2, 3) = 1 + 1/log2(3)
    val dcg = 1.0 / (math.log(3) / math.log(2)) + 0.5
    val idcg = 1.0 + 1.0 / (math.log(3) / math.log(2))
    assert(math.abs(r.getAs[Double]("ndcg") - dcg / idcg) < 1e-5, r.toString)
  }
}
