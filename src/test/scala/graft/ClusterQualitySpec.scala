package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ClusterQuality

/** Silhouette / Davies–Bouldin / Calinski–Harabasz on planted
  * geometry where every quantity is hand-derivable. */
class ClusterQualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // two clusters on the x-axis: {(0,0),(2,0)} around (1,0) and
  // {(10,0),(12,0)} around (11,0); all within-dists are 1, the
  // nearest-other-centroid dist is 10 for every point
  private def emb = Seq(
    (1L, Array(0f, 0f), 0), (2L, Array(2f, 0f), 0),
    (3L, Array(10f, 0f), 1), (4L, Array(12f, 0f), 1))
    .toDF("vec_id", "embedding", "label")

  test("silhouette on two tight separated clusters") {
    val r = ClusterQuality.silhouette(emb)
      .collect().map(x => x.getInt(0) -> x).toMap
    for (g <- Seq(0, 1)) {
      assert(r(g).getLong(1) == 2L)
      assert(math.abs(r(g).getDouble(2) - 1.0) < 1e-9, "mean_a")
      assert(math.abs(r(g).getDouble(3) - 10.0) < 1e-9, "mean_b")
      // per-point ratios, not ratio of means: ((11-1)/11 + (9-1)/9)/2
      val exp = (10.0 / 11.0 + 8.0 / 9.0) / 2.0
      assert(math.abs(r(g).getDouble(4) - exp) < 1e-5)
    }
  }

  test("davies-bouldin and calinski-harabasz on the same geometry") {
    val r = ClusterQuality.daviesBouldin(emb).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 4L)
    // s0 = s1 = 1, centroid dist = 10 → DB = (1+1)/10
    assert(math.abs(r.getDouble(2) - 0.2) < 1e-9)
    // SSW = 4 (four unit-dist points), SST = 4 + 2*(5^2)*2 = 104
    // CH = (100/1)/(4/2) = 50
    assert(math.abs(r.getDouble(3) - 50.0) < 1e-6)
  }
}
