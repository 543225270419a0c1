package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Stationarity

/** KPSS + Dickey–Fuller read OPPOSITE nulls — the spec drives both
  * on series where the pair must disagree in the informative
  * directions (trend: KPSS rejects, DF doesn't; mean-reverting:
  * DF rejects, KPSS doesn't), with statistics pinned to an
  * independent brute computation of the same closed forms. */
class StationaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def series(xs: Seq[Double]) =
    xs.zipWithIndex.map { case (v, i) =>
      (i.toLong, java.sql.Timestamp.valueOf(
        f"2024-03-${i + 1}%02d 12:00:00"), 1L, "view", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("kpss: a trending level rejects stationarity, mean reversion does not") {
    // y = 100 + 5i + (i%3): brute eta = 1.099893 at l = 2
    val trend = Stationarity.kpss(series(
      (0 until 30).map(i => 100.0 + 5 * i + (i % 3)))).collect().head
    assert(trend.getLong(0) == 30L && trend.getLong(1) == 2L)
    assert(math.abs(trend.getDouble(2) - 1.099893) < 1e-5,
      s"eta=${trend.getDouble(2)}")
    assert(trend.getBoolean(3))
    // x_t = 0.2 x_{t-1} + ((i%7)-3): brute eta = 0.039045 — ns
    var x = 10.0
    val mr = (0 until 30).map { i => x = 0.2 * x + (i % 7) - 3; 100 + x }
    val rmr = Stationarity.kpss(series(mr)).collect().head
    assert(math.abs(rmr.getDouble(2) - 0.039045) < 1e-5)
    assert(!rmr.getBoolean(3))
  }

  test("dickey-fuller: mean reversion rejects the unit root, trend does not") {
    var x = 10.0
    val mr = (0 until 30).map { i => x = 0.2 * x + (i % 7) - 3; 100 + x }
    val rmr = Stationarity.dickeyFuller(series(mr)).collect().head
    assert(rmr.getLong(0) == 29L)
    assert(math.abs(rmr.getDouble(1) - (-0.628155)) < 1e-5,
      s"beta=${rmr.getDouble(1)}")
    assert(math.abs(rmr.getDouble(2) - (-3.438109)) < 1e-5,
      s"tau=${rmr.getDouble(2)}")
    assert(rmr.getBoolean(3))
    val trend = Stationarity.dickeyFuller(series(
      (0 until 30).map(i => 100.0 + 5 * i + (i % 3)))).collect().head
    assert(math.abs(trend.getDouble(2) - (-0.086150)) < 1e-5)
    assert(!trend.getBoolean(3))
    // a perfectly-fit AR(1) (alternating ±10): RSS = 0 → NULL tau
    val alt = Stationarity.dickeyFuller(series(
      (0 until 30).map(i => 100.0 + (if (i % 2 == 1) 10.0 else -10.0))))
      .collect().head
    assert(alt.isNullAt(2) && !alt.getBoolean(3))
  }

  /** Day t carries `t` events summing to y_t, so the daily frame is
    * (x = t, y = y_t) — the two-series fixture engleGranger needs. */
  private def twoSeries(ys: Seq[Double]) =
    ys.zipWithIndex.flatMap { case (y, i) =>
      val t = i + 1
      (1 to t).map(j => ((i * 100 + j).toLong,
        java.sql.Timestamp.valueOf(f"2024-03-${t}%02d 12:00:00"),
        1L, "view", y / t, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("engle-granger: alternating residual cointegrates, exact fit nulls") {
    // y = 2x + (±1 alternating): the residual flips sign every day —
    // maximally mean-reverting → step-2 tau far past −3.3377
    val n = 12
    val es = (1 to n).map(t => if (t % 2 == 0) 1.0 else -1.0)
    val ys = (1 to n).map(t => 2.0 * t + es(t - 1))
    val r = Stationarity.engleGranger(twoSeries(ys)).collect().head
    // brute replay of the two closed-form steps
    val xs = (1 to n).map(_.toDouble)
    val (mx, my) = (xs.sum / n, ys.sum / n)
    val sxx = xs.map(x => (x - mx) * (x - mx)).sum
    val sxy = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    val syy = ys.map(y => (y - my) * (y - my)).sum
    val b = sxy / sxx; val a = my - b * mx
    val res = xs.zip(ys).map { case (x, y) => y - a - b * x }
    val (rl, rc) = (res.dropRight(1), res.tail)
    val srd = rl.zip(rc).map { case (l, c) => l * (c - l) }.sum
    val srr = rl.map(l => l * l).sum
    val sdd = rl.zip(rc).map { case (l, c) =>
      (c - l) * (c - l) }.sum
    val rho = srd / srr
    val tau = rho / math.sqrt(
      ((sdd - rho * srd) / (n - 2.0)) / srr)
    assert(r.getLong(0) == n.toLong)
    assert(math.abs(r.getDouble(1) - a) < 1e-6)
    assert(math.abs(r.getDouble(2) - b) < 1e-6)
    assert(math.abs(r.getDouble(3) - sxy * sxy / (sxx * syy)) < 1e-6)
    assert(math.abs(r.getDouble(4) - rho) < 1e-6)
    assert(math.abs(r.getDouble(5) - tau) < 1e-6)
    assert(r.getBoolean(6), s"tau=$tau must clear -3.3377")
    assert(rho < -1.0, "alternating residual over-corrects past -1")
    // exact fit y = 3x: residuals identically 0 → step 2 undefined
    val exact = Stationarity.engleGranger(
      twoSeries((1 to n).map(t => 3.0 * t))).collect().head
    assert(exact.isNullAt(4) && exact.isNullAt(5) &&
      !exact.getBoolean(6))
  }
}
