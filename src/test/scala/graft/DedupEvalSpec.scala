package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DedupEval

/** LSH quality-harness scoring on constructed corpora where the
  * ground truth is known by construction: near-identical pairs must
  * be found (recall), disjoint docs must not inflate precision, and
  * the verified stage can never score below the candidate stage on
  * precision. */
class DedupEvalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(): org.apache.spark.sql.DataFrame = {
    // 5 near-dup pairs (one token changed in ~12) + 20 unrelated docs
    val pairs = (0 until 5).flatMap { i =>
      val base = (0 until 12).map(j => s"tok${i}_$j").mkString(" ")
      val variant = base.replace(s"tok${i}_11", s"tok${i}_x")
      Seq((i.toLong * 2, base), (i.toLong * 2 + 1, variant))
    }
    val noise = (0 until 20).map(i =>
      (100L + i, (0 until 12).map(j => s"n${i}_$j").mkString(" ")))
    (pairs ++ noise).toDF("doc_id", "text")
  }

  test("planted near-dup pairs: both stages find all 5, nothing else") {
    val rows = DedupEval.lshQuality(corpus(), maxDocId = 1000L,
      threshold = 0.5).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getAs[Double]("precision"), r.getAs[Double]("recall")))
      .toMap
    val (truthC, foundC, correctC, _, recallC) = rows("candidates")
    val (truthV, foundV, correctV, precV, recallV) = rows("verified")
    assert(truthC == 5L && truthV == 5L, s"ground truth must be 5: $rows")
    assert(recallC == 1.0, s"candidates missed a planted pair: $rows")
    assert(correctC == 5L)
    // verification trims any false candidates: exact precision/recall
    assert(foundV == 5L && correctV == 5L)
    assert(precV == 1.0 && recallV == 1.0, s"got $rows")
  }

  test("all-disjoint corpus: zero truth, zero verified, precision 0 by convention") {
    val docs = (0 until 15).map(i =>
      (i.toLong, (0 until 10).map(j => s"d${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val rows = DedupEval.lshQuality(docs, maxDocId = 100L).collect()
    rows.foreach { r =>
      assert(r.getLong(1) == 0L, "no pair should verify on disjoint docs")
      assert(r.getAs[Double]("recall") == 0.0)
      assert(r.getAs[Double]("f1") == 0.0)
    }
    val verified = rows.find(_.getString(0) == "verified").get
    assert(verified.getLong(2) == 0L, "verify must kill disjoint candidates")
  }

  test("maxDocId bounds the harness slice") {
    val rows = DedupEval.lshQuality(corpus(), maxDocId = 10L).collect()
    // only the 5 planted pairs live below id 10
    assert(rows.forall(_.getLong(1) == 5L))
  }
}
