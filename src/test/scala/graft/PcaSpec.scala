package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Pca

/** PCA tier: the covariance dataflow against hand math, the Jacobi
  * eigensolver against its algebraic contracts (orthonormal basis,
  * exact reconstruction), and whitening against its defining property
  * (identity covariance in the projected space). */
class PcaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic anisotropic 2-D cloud embedded in 3-D: x₃ = 0, and
  // (x₁, x₂) stretched along the diagonal
  private def cloud = Seq(
    (1L, Array(2.0f, 1.9f, 0.0f), 0),
    (2L, Array(-2.0f, -2.1f, 0.0f), 0),
    (3L, Array(1.0f, 1.1f, 0.0f), 1),
    (4L, Array(-1.0f, -0.9f, 0.0f), 1),
    (5L, Array(0.2f, -0.2f, 0.0f), 2),
    (6L, Array(-0.2f, 0.2f, 0.0f), 2)
  ).toDF("vec_id", "embedding", "label")

  test("covariance matches hand-computed population moments") {
    // two 2-D vectors (1,2) and (3,6): mean (2,4);
    // cov11 = 1, cov12 = 2, cov22 = 4
    val df = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(3.0f, 6.0f)))
      .toDF("vec_id", "embedding")
    val got = Pca.covariance(df)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(got == Map((1L, 1L) -> 1.0, (1L, 2L) -> 2.0, (2L, 2L) -> 4.0))
  }

  test("jacobi: orthonormal eigenvectors, exact reconstruction, known 2x2") {
    // [[2,1],[1,2]] has eigenvalues 3 (along (1,1)) and 1
    val (ev, vec) = Pca.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(ev(0) - 3.0) < 1e-12 && math.abs(ev(1) - 1.0) < 1e-12)
    assert(math.abs(math.abs(vec(0)(0)) - math.sqrt(0.5)) < 1e-12)
    // a fixed symmetric 4×4: U orthonormal and A = U·Λ·Uᵀ
    val a = Array(
      Array(4.0, 1.0, -2.0, 0.5),
      Array(1.0, 3.0, 0.0, -1.0),
      Array(-2.0, 0.0, 5.0, 2.0),
      Array(0.5, -1.0, 2.0, 1.0))
    val (l, u) = Pca.jacobiEigen(a)
    val n = a.length
    for (i <- 0 until n; j <- 0 until n) {
      val dot = (0 until n).map(k => u(i)(k) * u(j)(k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"eigenvector rows $i,$j not orthonormal: $dot")
      val recon = (0 until n).map(c => l(c) * u(c)(i) * u(c)(j)).sum
      assert(math.abs(recon - a(i)(j)) < 1e-9,
        s"reconstruction off at ($i,$j): $recon vs ${a(i)(j)}")
    }
    assert(l.sorted.reverse.sameElements(l), "eigenvalues not descending")
  }

  test("spectrum: diagonal-dominant cloud, degenerate axis, isotropy ratio") {
    val rows = Pca.spectrum(cloud)
      .select("component", "eigenvalue", "var_explained", "cum_var",
        "participation_ratio")
      .collect()
    assert(rows.length == 3)
    val ev = rows.map(_.getDouble(1))
    // dominant direction is the (1,1,0) diagonal; third axis is dead
    assert(ev(0) > 10 * ev(1) && ev(2) == 0.0)
    assert(rows.last.getDouble(3) == 1.0, "cum_var must end at 1")
    val pr = rows.head.getDouble(4)
    assert(pr > 1.0 && pr < 1.2,
      s"one dominant direction of three → PR barely above 1, got $pr")
  }

  test("whitening yields identity covariance in the projected space") {
    val model = Pca.fit(cloud)
    val w = Pca.whiten(cloud, model, k = 2)
      .select(col("vec_id"), col("whitened")(0).as("p1"),
        col("whitened")(1).as("p2"))
    val stats = w.agg(
      avg("p1"), avg("p2"),
      var_pop("p1"), var_pop("p2"),
      covar_pop(col("p1"), col("p2"))).collect().head
    assert(math.abs(stats.getDouble(0)) < 1e-9)
    assert(math.abs(stats.getDouble(1)) < 1e-9)
    assert(math.abs(stats.getDouble(2) - 1.0) < 1e-6,
      s"whitened var p1 ${stats.getDouble(2)}")
    assert(math.abs(stats.getDouble(3) - 1.0) < 1e-6,
      s"whitened var p2 ${stats.getDouble(3)}")
    assert(math.abs(stats.getDouble(4)) < 1e-6,
      s"whitened covariance ${stats.getDouble(4)}")
  }

  test("whitening an already-isotropic space preserves neighbor ranking") {
    // ±e1, ±e2 with equal magnitude: covariance is diag(½, ½), so
    // whitening is a uniform scale (+ axis permutation) — cosine
    // rankings must survive exactly
    val iso = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(-1.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.0f, -1.0f))
    ).toDF("vec_id", "embedding")
    val model = Pca.fit(iso)
    val wht = Pca.whiten(iso, model, k = 2)
      .select(col("vec_id"),
        col("whitened").cast("array<float>").as("embedding"))
    def ranked(d: org.apache.spark.sql.DataFrame) =
      graft.operators.Similarity.bruteForceTopK(d, d, k = 3)
        .select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
    assert(ranked(iso) == ranked(wht),
      "isotropic input → whitening must not move any neighbor rank")
  }

  test("whitening zero-scales degenerate components instead of exploding") {
    val model = Pca.fit(cloud)
    val p3 = Pca.whiten(cloud, model, k = 3)
      .select(col("whitened")(2)).as[Double].collect()
    assert(p3.forall(_ == 0.0), "dead axis must map to 0, not 1/sqrt(0)")
  }
}
