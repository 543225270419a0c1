package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Skyline

/** The grid-pruned skyline equals the brute-force NOT-EXISTS frontier
  * on seeded data, including ties and the degenerate one-level case. */
class SkylineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def brute(pts: Seq[(Long, Double, Long)]): Set[Long] =
    pts.filter { case (_, hi, lo) =>
      !pts.exists { case (_, h2, l2) =>
        (h2 >= hi && l2 <= lo) && (h2 > hi || l2 < lo)
      }
    }.map(_._1).toSet

  private def run(pts: Seq[(Long, Double, Long)]): Set[Long] = {
    val df = pts.toDF("id", "hi", "lo")
    Skyline.frontier2d(df, col("hi"), col("lo"))
      .select("id").collect().map(_.getLong(0)).toSet
  }

  test("matches brute force on deterministic pseudo-random points") {
    // LCG so the fixture is stable; values collide on purpose
    var s = 12345L
    def next(m: Int) = { s = (s * 1103515245L + 12345L) & 0x7fffffffL
      (s % m).toInt }
    val pts = (1 to 400).map { i =>
      (i.toLong, next(50).toDouble, next(40).toLong + 1L)
    }
    assert(run(pts) == brute(pts))
  }

  test("staircase trade-off (lo grows with hi): every point kept") {
    // higher hi always costs higher lo → nothing dominates anything
    val pts = (1 to 50).map(i => (i.toLong, i.toDouble, i.toLong))
    assert(brute(pts) == pts.map(_._1).toSet, "fixture sanity")
    assert(run(pts) == pts.map(_._1).toSet)
  }

  test("dominated chain (lo falls as hi grows): one corner survives") {
    // point 50 has max hi AND min lo — it dominates all 49 others
    val pts = (1 to 50).map(i => (i.toLong, i.toDouble, 51L - i))
    assert(brute(pts) == Set(50L), "fixture sanity")
    assert(run(pts) == Set(50L))
  }

  test("ties on both dims are mutually non-dominating and all kept") {
    val pts = Seq((1L, 10.0, 5L), (2L, 10.0, 5L), (3L, 10.0, 7L),
      (4L, 9.0, 5L), (5L, 11.0, 9L))
    val got = run(pts)
    assert(got == brute(pts))
    assert(got.contains(1L) && got.contains(2L),
      "equal points must both survive")
    assert(!got.contains(3L), "same hi, worse lo is dominated")
    assert(!got.contains(4L), "lower hi, equal lo is dominated")
  }

  test("degenerate: constant maximize dim keeps only the min-lo rows") {
    val pts = Seq((1L, 5.0, 3L), (2L, 5.0, 2L), (3L, 5.0, 2L))
    assert(run(pts) == Set(2L, 3L))
  }

  test("customerFrontier members dominate every non-member") {
    val orders = Seq(
      (1L, 10L, "O", 100.0, "1996-01-01", "1-URGENT"),
      (2L, 10L, "O", 100.0, "1996-01-02", "1-URGENT"),
      (3L, 20L, "O", 300.0, "1996-01-03", "1-URGENT"),
      (4L, 30L, "O", 50.0, "1996-01-04", "1-URGENT"),
      (5L, 30L, "O", 100.0, "1996-01-05", "1-URGENT"),
      (6L, 30L, "O", 100.0, "1996-01-06", "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    // per-customer: 10 → (200, 2); 20 → (300, 1); 30 → (250, 3)
    // frontier: 20 (best on both vs 10 and 30) only — 10 is dominated
    // by 20 (300>200, 1<2), 30 dominated by 20 too
    val got = Skyline.customerFrontier(orders)
      .select("c_custkey").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(20L))
  }
}
