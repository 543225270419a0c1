package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** MMR rerank semantics: diversity beats redundancy at low λ, λ=1
  * degenerates to plain top-m, ranks are deterministic. */
class MmrRerankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // corpus: the query (100), two near-identical high-sim twins (1, 2),
  // and one orthogonal-but-retrieved candidate (3)
  private val vecs = Seq(
    (100L, Seq(1.000f, 0.000f)),
    (1L, Seq(1.000f, 0.001f)),
    (2L, Seq(0.999f, 0.002f)),
    (3L, Seq(0.100f, 0.995f)))
    .toDF("vec_id", "embedding")
    .select(col("vec_id"), col("embedding").cast("array<float>"))
  private def queries = vecs.filter(col("vec_id") === 100L)

  test("low lambda swaps the redundant twin for the diverse candidate") {
    val got = Similarity.mmrRerank(vecs, queries, k = 3, m = 2,
      lambda = 0.3, numCentroids = 1)
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(got.map(_._2) == Seq(1L, 3L), s"$got")
    // plain top-2 (lambda = 1) keeps both twins instead
    val plain = Similarity.mmrRerank(vecs, queries, k = 3, m = 2,
      lambda = 1.0, numCentroids = 1)
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(plain.map(_._2) == Seq(1L, 2L), s"$plain")
  }

  test("lambda = 1 ordering equals the underlying top-k ordering") {
    val mmr = Similarity.mmrRerank(vecs, queries, k = 3, m = 3,
      lambda = 1.0, numCentroids = 1)
      .as[(Long, Long, Double, Long)].collect().map(_._2).toSeq
    val topk = Similarity.ivfTopK(vecs, queries, k = 3,
      numCentroids = 1, nprobe = 1)
      .as[(Long, Long, Double, Int)].collect().map(_._2).toSeq
    assert(mmr == topk)
  }

  test("rerank is deterministic and respects m") {
    val a = Similarity.mmrRerank(vecs, queries, k = 3, m = 2,
      lambda = 0.5, numCentroids = 1).collect().toSeq
    val b = Similarity.mmrRerank(vecs, queries, k = 3, m = 2,
      lambda = 0.5, numCentroids = 1).collect().toSeq
    assert(a == b)
    assert(a.length == 2)
    assert(a.map(_.getLong(3)).toSeq == Seq(1L, 2L)) // ranks 1..m
  }

  test("invalid parameters are rejected eagerly") {
    intercept[IllegalArgumentException] {
      Similarity.mmrRerank(vecs, queries, k = 2, m = 3) }
    intercept[IllegalArgumentException] {
      Similarity.mmrRerank(vecs, queries, lambda = 1.5) }
  }
}
