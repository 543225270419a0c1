package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.DifferentialPrivacy

/** DP release contract: ledger arithmetic (ε composition, budget
  * gate, cumulative release counts), and the seeded Laplace
  * mechanism's determinism + boundedness + non-negativity. */
class DifferentialPrivacySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val ev = (1 to 30).flatMap { d =>
    val n = if (d <= 10) 2 else 1 // early days are denser
    (1 to n).map(i =>
      (d.toLong * 100 + i, f"2024-01-$d%02d 12:00:00", "click"))
  }.toDF("event_id", "ts_s", "event_type")
    .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")

  test("ledger: releases are cumulative day-slices with composed epsilon") {
    val rows = DifferentialPrivacy.releaseAccounting(ev,
      epsilonPerRelease = 0.5, totalBudget = 2.0).collect()
    assert(rows.length == 3)
    val byRel = rows.map(r => r.getInt(0) ->
      (r.getAs[Long]("n"), r.getAs[Double]("cum_epsilon"),
        r.getAs[Boolean]("within_budget"))).toMap
    assert(byRel(1)._1 == 20L) // days 1-10, 2/day
    assert(byRel(2)._1 == 30L) // + days 11-20, 1/day
    assert(byRel(3)._1 == 40L) // full month
    assert(byRel(1)._2 == 0.5 && byRel(2)._2 == 1.0 && byRel(3)._2 == 1.5)
    assert(rows.forall(_.getAs[Boolean]("within_budget")))
  }

  test("ledger: budget gate flips when composition exceeds the budget") {
    val rows = DifferentialPrivacy.releaseAccounting(ev,
      epsilonPerRelease = 0.9, totalBudget = 2.0).collect()
    val gate = rows.map(r => r.getInt(0) -> r.getAs[Boolean]("within_budget"))
      .toMap
    assert(gate(1) && gate(2) && !gate(3), s"got $gate")
  }

  test("mechanism: deterministic run-to-run, bounded, non-negative") {
    val a = DifferentialPrivacy.noisedRelease(ev, seed = 7L).collect()
    val b = DifferentialPrivacy.noisedRelease(ev, seed = 7L).collect()
    assert(a.toSeq == b.toSeq, "seeded mechanism must be reproducible")
    val truth = DifferentialPrivacy.releaseAccounting(ev).collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getAs[Long]("n")).toMap
    a.foreach { r =>
      val key = (r.getInt(0), r.getString(1))
      val noised = r.getAs[Long]("noised_n")
      val bound = r.getAs[Double]("noise_abs_bound")
      assert(noised >= 0L)
      assert(math.abs(noised - truth(key)) <= bound + 1,
        s"noise for $key exceeds the clamp bound")
    }
  }

  test("mechanism: a different seed moves at least one published count") {
    val a = DifferentialPrivacy.noisedRelease(ev, seed = 1L)
      .select("noised_n").collect().map(_.getLong(0)).toSeq
    val b = DifferentialPrivacy.noisedRelease(ev, seed = 2L)
      .select("noised_n").collect().map(_.getLong(0)).toSeq
    assert(a != b, "independent seeds should not collide on every count")
  }

  test("mechanism: noise is actually applied (not an identity copy)") {
    // across 3 releases the probability all seeded draws round to 0
    // with b = 2 is negligible; assert at least one differs
    val truth = DifferentialPrivacy.releaseAccounting(ev).collect()
      .map(r => r.getAs[Long]("n")).toSeq
    val noised = DifferentialPrivacy.noisedRelease(ev).collect()
      .map(r => r.getAs[Long]("noised_n")).toSeq
    assert(truth != noised, "no noise was injected")
  }
}
