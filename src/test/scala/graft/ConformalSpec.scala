package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Conformal

class ConformalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def gate(cal: Seq[Double], ev: Seq[Double], alpha: Double) =
    Conformal.outlierGate(cal.toDF("s"), ev.toDF("s"), "s", alpha)
      .select("qhat", "n_flagged", "flag_rate")
      .as[(Double, Long, Double)].collect().head

  test("qhat is the ceil((n+1)(1-alpha))-th smallest calibration score") {
    // n = 9, alpha = 0.1 → k = ceil(10·0.9) = 9 → 9th smallest = 9.0
    val cal = (1 to 9).map(_.toDouble)
    val got = gate(cal, Seq(8.5, 9.0, 9.5), 0.1)
    assert(got._1 == 9.0)
    // flags strictly above qhat only
    assert(got._2 == 1L)
  }

  test("empirical false-flag rate on exchangeable data honors alpha") {
    val rnd = new scala.util.Random(17)
    // one exchangeable pool, split at random — the guarantee's setting
    val pool = (1 to 4000).map(_ => math.rint(rnd.nextGaussian() * 100) / 100)
    val (cal, ev) = pool.splitAt(2000)
    for (alpha <- Seq(0.05, 0.2)) {
      val got = gate(cal, ev, alpha)
      // P(flag) ≤ α in expectation; allow sampling slack
      assert(got._3 <= alpha + 0.03,
        s"alpha=$alpha flag_rate=${got._3}")
      assert(got._3 >= alpha - 0.05)
    }
  }

  test("shifted eval distribution IS flagged above the budget") {
    val rnd = new scala.util.Random(23)
    val cal = (1 to 2000).map(_ => math.rint(rnd.nextGaussian() * 100) / 100)
    val ev = (1 to 1000).map(_ =>
      math.rint((3.0 + rnd.nextGaussian()) * 100) / 100)
    val got = gate(cal, ev, 0.1)
    assert(got._3 > 0.5, s"a 3σ shift must blow the α budget: ${got._3}")
  }

  test("tiny calibration set degenerates to flag-nothing") {
    // n = 3, alpha = 0.1 → k = ceil(4·0.9) = 4 > n → qhat = +inf
    val got = gate(Seq(1.0, 2.0, 3.0), Seq(100.0, 200.0), 0.1)
    assert(got._2 == 0L && got._3 == 0.0)
  }

  test("ties: duplicated boundary scores keep the order statistic exact") {
    // sorted: 1,2,2,2,5,6,7,8,9 (n=9); alpha=0.1 → k=9 → 9th = 9.0
    val cal = Seq(1.0, 2.0, 2.0, 2.0, 5.0, 6.0, 7.0, 8.0, 9.0)
    assert(gate(cal, Seq(8.9), 0.1)._1 == 9.0)
    // k lands inside the tie block: n=9, alpha=0.7 → k=ceil(10·0.3)=3 →
    // 3rd smallest = 2.0
    assert(gate(cal, Seq(1.5), 0.7)._1 == 2.0)
  }
}
