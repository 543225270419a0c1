package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.EmbeddingAudit

/** Planted-geometry semantics for the embedding audits: collapsed vs
  * spread spaces, copied vs independent dimension blocks, clean vs
  * flipped labels. */
class EmbeddingAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // two tight clusters on orthogonal axes, plus per-point jitter in
  // the other dims when `spread`
  private def space(spread: Boolean) =
    (0L until 40L).map { i =>
      val base = if (i % 2 == 0) Array(1.0f, 0.0f, 0.0f, 0.0f)
        else Array(0.0f, 1.0f, 0.0f, 0.0f)
      val v = if (spread)
        base.zipWithIndex.map { case (x, d) =>
          x + 0.8f * math.sin(i * 1.3 + d).toFloat }
      else base
      (i, v, (i % 2).toInt)
    }.toDF("vec_id", "embedding", "label")

  test("alignment: collapsed clusters score 0, jittered ones don't") {
    val tight = EmbeddingAudit.alignmentUniformity(space(false),
      buckets = 3).collect()(0)
    assert(tight.getDouble(1) == 0.0, "identical positives align at 0")
    val loose = EmbeddingAudit.alignmentUniformity(space(true),
      buckets = 3).collect()(0)
    assert(loose.getDouble(1) > 0.1, "jitter separates positives")
    // spread space is more uniform (lower log-mean-exp) than the
    // two-point collapsed space
    assert(loose.getDouble(3) < tight.getDouble(3))
  }

  test("cka: a copied block scores 1, an independent block doesn't") {
    val copied = (0L until 50L).map { i =>
      val h = Array(math.sin(i * 0.7).toFloat, math.cos(i * 1.1).toFloat)
      (i, h ++ h, 0)
    }.toDF("vec_id", "embedding", "label")
    val c = EmbeddingAudit.cka(copied, split = 2).collect()(0)
    assert(math.abs(c.getDouble(5) - 1.0) < 1e-4,
      s"copied halves cka=${c.getDouble(5)}")
    val indep = (0L until 200L).map { i =>
      (i, Array(math.sin(i * 0.7).toFloat, math.cos(i * 1.1).toFloat,
        math.sin(i * 5.3 + 1.0).toFloat,
        math.cos(i * 7.9 + 2.0).toFloat), 0)
    }.toDF("vec_id", "embedding", "label")
    val u = EmbeddingAudit.cka(indep, split = 2).collect()(0)
    assert(u.getDouble(5) < 0.5, s"independent halves cka=${u.getDouble(5)}")
  }

  test("knn label noise: flipped labels get outvoted") {
    // two tight clusters; flip the label of one member of cluster 0
    val rows = (0L until 30L).map { i =>
      val cl = (i % 2).toInt
      val v = if (cl == 0) Array(1.0f, 0.01f * i, 0f, 0f)
        else Array(0f, 0f, 1.0f, 0.01f * i)
      val lbl = if (i == 14L) 1 else cl   // i=14 is in cluster 0
      (i, v, lbl)
    }.toDF("vec_id", "embedding", "label")
    val r = EmbeddingAudit.knnLabelNoise(rows, k = 5, probeMod = 7)
      .collect().map(x => x.getInt(0) -> x).toMap
    // probes are vec_id 0,7,14,21,28: 14 carries the flipped label 1
    // and sits inside cluster 0 -> all 5 neighbors disagree
    assert(r(1).getDouble(3) == 1.0, "flipped probe fully outvoted")
    // clean label-0 probes (0, 28) keep... 0 and 28: cluster 0 mostly
    // label 0 except the flipped 14 -> low disagreement, not 1.0
    assert(r(0).getDouble(2) < 0.5)
  }
}
