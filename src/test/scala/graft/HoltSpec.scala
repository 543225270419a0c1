package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Forecast, Regression}
import org.apache.spark.sql.functions._

/** Holt fold equals the hand recursion; a trending series beats SES's
  * lagged forecast; Durbin–Watson reads ≈2 on independent residuals
  * and small on a runs-structured series. */
class HoltSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(id: Long, day: Int, et: String, n: Int) =
    (1 to n).map(j => ((id * 1000 + j), java.sql.Timestamp.valueOf(
      f"2024-07-$day%02d 08:00:00"), 1L, et, 2.0, "{}"))

  private def frame(rows: Seq[(Long, java.sql.Timestamp, Long, String,
      Double, String)]) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  private def handHolt(ys: Seq[Double], a: Double = 0.3,
      b: Double = 0.1): (Double, Double, Double) = {
    var l = ys.head; var t = 0.0; var sae = 0.0
    ys.tail.foreach { y =>
      sae += math.abs(y - (l + t))
      val l2 = a * y + (1 - a) * (l + t)
      t = b * (l2 - l) + (1 - b) * t
      l = l2
    }
    (l, t, sae / (ys.length - 1))
  }

  test("fold equals the hand recursion on a planted series") {
    val counts = Seq(5, 8, 6, 12, 9, 14, 11, 18)
    val e = frame(counts.zipWithIndex.flatMap { case (n, i) =>
      ev(i.toLong, i + 1, "a", n) })
    val r = Forecast.holtBacktest(e).collect().head
    val (l, t, mae) = handHolt(counts.map(_.toDouble))
    assert(r.getLong(1) == 8L)
    assert(math.abs(r.getDouble(2) - math.rint(l * 1e6) / 1e6) < 1e-9)
    assert(math.abs(r.getDouble(3) - math.rint(t * 1e6) / 1e6) < 1e-9)
    assert(math.abs(r.getDouble(4) - math.rint((l + t) * 1e6) / 1e6) < 1e-9)
    assert(math.abs(r.getDouble(5) - math.rint(mae * 1e6) / 1e6) < 1e-9)
  }

  test("on a linear ramp Holt's trend state locks onto the slope sign") {
    // daily counts 2,4,6,...,40: trend must be positive and the
    // forecast above the last level
    val e = frame((1 to 20).flatMap(d => ev(d.toLong, d, "a", 2 * d)))
    val r = Forecast.holtBacktest(e).collect().head
    assert(r.getDouble(3) > 0.5, s"trend should be clearly positive")
    assert(r.getDouble(4) > r.getDouble(2), "forecast = level + trend")
  }

  test("Mann–Kendall: monotone ramp is 'up' with S = all pairs; flat is 'none'") {
    // strictly increasing daily counts: every pair concordant →
    // S = C(20,2) = 190, z large
    val up = frame((1 to 20).flatMap(d => ev(d.toLong, d, "a", d)))
    val r = graft.operators.Anomaly.mannKendall(up).collect().head
    assert(r.getLong(0) == 20L)
    assert(r.getLong(1) == 190L)
    assert(r.getString(4) == "up")
    // hand z: varS = 20·19·45/18 = 950; z = 189/√950 ≈ 6.132
    assert(math.abs(r.getDouble(3) - 189.0 / math.sqrt(950.0)) < 1e-5)
    // constant series: S = 0, all tied, trend none, z = 0
    val flat = frame((1 to 15).flatMap(d => ev((100 + d).toLong, d, "a", 7)))
    val f = graft.operators.Anomaly.mannKendall(flat).collect().head
    assert(f.getLong(1) == 0L && f.getDouble(3) == 0.0)
    assert(f.getString(4) == "none")
  }

  test("runs test: regimes read clustered, alternation oscillating") {
    // value per event is 2.0, so daily revenue = 2×count.
    // regimes: 10 low days then 10 high days → 2 runs (min possible)
    val regimes = frame((1 to 20).flatMap(d =>
      ev(d.toLong, d, "a", if (d <= 10) 3 else 9)))
    val r = graft.operators.Anomaly.runsTest(regimes).collect().head
    assert(r.getLong(2) == 2L, s"two regimes = two runs: $r")
    assert(r.getString(5) == "clustered")
    // strict alternation: 20 runs (max possible)
    val alt = frame((1 to 20).flatMap(d =>
      ev((100 + d).toLong, d, "a", if (d % 2 == 0) 9 else 3)))
    val a = graft.operators.Anomaly.runsTest(alt).collect().head
    assert(a.getLong(2) == 20L)
    assert(a.getString(5) == "oscillating")
    // hand values: n=20, n+=10 → E[R] = 2·10·10/20 + 1 = 11
    assert(math.abs(a.getDouble(3) - 11.0) < 1e-9)
  }

  test("Durbin–Watson: alternating residuals push DW toward 4, runs toward 0") {
    // flat trend + alternating +/-10 noise → e_t − e_{t−1} = ±20:
    // DW = Σ(20²)/Σ(10²) ≈ 4
    val alt = frame((1 to 20).flatMap(d =>
      ev(d.toLong, d, "alt", 50 + (if (d % 2 == 0) 10 else -10))))
    // two long runs (low half, high half) de-trended still leave runs:
    // adjacent residuals nearly equal → DW near 0
    val runs = frame((1 to 20).flatMap { d =>
      val base = if (d <= 10) 20 else 80
      ev((100 + d).toLong, d, "runs", base)
    })
    val got = Regression.durbinWatson(alt.unionByName(runs)).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got("alt") > 3.0, s"alternation → DW near 4, got ${got("alt")}")
    assert(got("runs") < 1.0, s"runs → DW near 0, got ${got("runs")}")
  }
}
