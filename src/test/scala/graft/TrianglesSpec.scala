package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Triangles

class TrianglesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def stats(edges: Seq[(Int, Int)]) =
    Triangles.triangleStats(
      edges.map { case (s, d) => (s, d, 1L) }.toDF("src", "dst", "w"))
      .select("page", "degree", "triangles", "coeff")
      .as[(Int, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("K4: every node in 3 triangles with coefficient 1.0") {
    val k4 = for (a <- 1 to 4; b <- 1 to 4 if a < b) yield (a, b)
    val got = stats(k4)
    assert(got.keySet == Set(1, 2, 3, 4))
    assert(got.values.forall(_ == ((3L, 3L, 1.0))))
  }

  test("triangle with a pendant: coefficients and zero counts") {
    // 1-2-3 triangle, 4 hangs off 3
    val got = stats(Seq((1, 2), (2, 3), (1, 3), (3, 4)))
    assert(got(1) == ((2L, 1L, 1.0)))
    assert(got(2) == ((2L, 1L, 1.0)))
    assert(got(3) == ((3L, 1L, round3(2.0 / 6.0))))
    assert(got(4) == ((1L, 0L, 0.0)))
  }

  test("path graph has no triangles") {
    val got = stats(Seq((1, 2), (2, 3), (3, 4)))
    assert(got.values.forall { case (_, t, c) => t == 0L && c == 0.0 })
  }

  test("direction, multiplicity and self-loops collapse to one edge") {
    val noisy = Seq((1, 2), (2, 1), (1, 2), (2, 3), (3, 1), (1, 1), (2, 2))
    val clean = Seq((1, 2), (2, 3), (1, 3))
    assert(stats(noisy) == stats(clean))
  }

  test("hub-and-spoke: hub has wedges but no triangles") {
    val star = (2 to 12).map(i => (1, i))
    val got = stats(star)
    assert(got(1) == ((11L, 0L, 0.0)))
    assert((2 to 12).forall(i => got(i) == ((1L, 0L, 0.0))))
  }

  private def round3(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
