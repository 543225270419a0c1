package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SeriesTests

class SeriesTestsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // one event per day with the given value → the daily series IS the
  // value sequence
  private def series(xs: Seq[Double]) = {
    xs.zipWithIndex.map { case (v, i) =>
      (i.toLong, java.sql.Timestamp.valueOf(
        f"2024-03-${i + 1}%02d 12:00:00"), 1L, "view", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("turning points: alternating series maximal, monotone has zero") {
    // 1,5,2,6,3,7,4 — every interior point is a turning point (5)
    val alt = SeriesTests.turningPoints(
      series(Seq(1, 5, 2, 6, 3, 7, 4).map(_.toDouble))).collect().head
    assert(alt.getLong(0) == 7L && alt.getLong(1) == 5L)
    // E[T] = 2(7−2)/3 = 10/3; Var = (112−29)/90
    assert(math.abs(alt.getDouble(2) - 10.0 / 3) < 1e-6)
    val z = (5 - 10.0 / 3) / math.sqrt(83.0 / 90)
    assert(math.abs(alt.getDouble(3) - z) < 1e-6)
    val mono = SeriesTests.turningPoints(
      series((1 to 30).map(_.toDouble))).collect().head
    assert(mono.getLong(1) == 0L && mono.getString(5) == "smooth" &&
      mono.getBoolean(4))
  }

  test("pettitt: a planted level shift is located and dated; wiggle is not") {
    // 15 days around 100 then 15 around 200: U_15 = -225 (every
    // early-late pair ranks low-high), K = 225, change day = the
    // last pre-shift day, p = 2·exp(-6·225²/(27000+900)) = 3.74e-5
    val shift = SeriesTests.pettitt(series(
      (0 until 30).map(i =>
        (if (i < 15) 100.0 else 200.0) + (i % 5)))).collect().head
    assert(shift.getLong(0) == 30L)
    assert(shift.getLong(1) == 225L, s"K=${shift.getLong(1)}")
    assert(shift.getDate(2).toString == "2024-03-15")
    assert(math.abs(shift.getDouble(3) - 3.7e-5) < 1e-5)
    assert(shift.getBoolean(4))
    // stationary wiggle: K small, p capped at 1, not significant
    val nul = SeriesTests.pettitt(series(
      (0 until 30).map(i => 100.0 + (i % 7) * 3 - (i % 3))))
      .collect().head
    assert(nul.getLong(1) == 47L, s"K=${nul.getLong(1)}")
    assert(nul.getDouble(3) == 1.0 && !nul.getBoolean(4))
  }

  test("l-moments agree with a brute order-statistics computation") {
    def brute(xs: Seq[Double]): (Double, Double, Double, Double) = {
      val s = xs.sorted
      val n = s.size.toDouble
      def b(r: Int): Double = s.zipWithIndex.map { case (x, i0) =>
        val i = i0 + 1.0
        x * (1 to r).map(k => (i - k) / (n - k)).product
      }.sum / n
      val (b0, b1, b2, b3) = (b(0), b(1), b(2), b(3))
      (b0, 2 * b1 - b0, 6 * b2 - 6 * b1 + b0,
        20 * b3 - 30 * b2 + 12 * b1 - b0)
    }
    // deterministic right-skewed sample (quadratic growth)
    val xs = (0 until 30).map(i => 10.0 + i * i * 0.5)
    val (l1, l2, l3, l4) = brute(xs)
    val r = SeriesTests.lMoments(series(xs)).collect().head
    assert(r.getLong(0) == 30L)
    assert(math.abs(r.getDouble(1) - l1) < 1.1e-6)
    assert(math.abs(r.getDouble(2) - l2) < 1.1e-6)
    assert(math.abs(r.getDouble(3) - l2 / l1) < 1.1e-6)
    assert(math.abs(r.getDouble(4) - l3 / l2) < 1.1e-6)
    assert(math.abs(r.getDouble(5) - l4 / l2) < 1.1e-6)
    assert(r.getDouble(4) > 0.2, "quadratic growth is right-skewed")
    // symmetric sample: L-skewness exactly 0; uniform L-CV known:
    // for x = 1..n, tau2 = (n+1)/(3... (brute-checked instead)
    val sym = (1 to 29).map(_.toDouble)
    val rs = SeriesTests.lMoments(series(sym)).collect().head
    assert(math.abs(rs.getDouble(4)) < 1e-9, "symmetric -> l_skew 0")
    val (s1, s2, _, _) = brute(sym)
    assert(math.abs(rs.getDouble(3) - s2 / s1) < 1.1e-6)
  }

  test("cox-stuart: a step series reads up, a flat one reads none") {
    // 10 days: 1..5 then 11..15 — every pair (i, i+5) rises
    val step = SeriesTests.coxStuart(series(
      (1 to 5).map(_.toDouble) ++ (11 to 15).map(_.toDouble)))
      .collect().head
    assert(step.getLong(0) == 10L && step.getLong(1) == 5L &&
      step.getLong(2) == 5L)
    // z = (5 − 2.5)/sqrt(1.25)
    assert(math.abs(step.getDouble(3) - 2.5 / math.sqrt(1.25)) < 1e-6)
    assert(step.getBoolean(4) && step.getString(5) == "up")
    // constant series: every pair ties → n' = 0 → NULL z, not sig
    val flat = SeriesTests.coxStuart(series(Seq.fill(8)(3.0)))
      .collect().head
    assert(flat.getLong(1) == 0L && flat.isNullAt(3) &&
      !flat.getBoolean(4))
  }

  test("records test: a strictly rising series is all records") {
    val up = SeriesTests.recordsTest(series((1 to 10).map(_.toDouble)))
      .collect().head
    assert(up.getLong(0) == 10L && up.getLong(1) == 10L)
    // E = H_10, Var = H_10 − H_10^(2)
    val h1 = (1 to 10).map(1.0 / _).sum
    val h2 = (1 to 10).map(k => 1.0 / (k.toLong * k)).sum
    assert(math.abs(up.getDouble(2) - h1) < 1e-6)
    assert(math.abs(up.getDouble(3) - (10 - h1) / math.sqrt(h1 - h2))
      < 1e-6)
    assert(up.getBoolean(4))
    // a falling series has exactly one record (the first point)
    val down = SeriesTests.recordsTest(
      series((1 to 10).reverse.map(_.toDouble))).collect().head
    assert(down.getLong(1) == 1L)
  }

  test("hjorth: an alternating ±1 series replays closed-form moments") {
    // x = +1,−1,+1,… (n=12): var(x) = 1, d1 alternates ∓2 over 11
    // points (mean −2/11, not exactly 0 — the odd count), d2 = ±4 →
    // mobility ≈ 2 and complexity ≈ 1 up to those small-sample
    // mean offsets
    val xs = (0 until 12).map(i => if (i % 2 == 0) 1.0 else -1.0)
    val r = SeriesTests.hjorth(series(xs)).collect().head
    assert(r.getLong(0) == 12L)
    assert(math.abs(r.getDouble(2) - 2.0) < 0.02,
      s"mobility=${r.getDouble(2)}")
    assert(math.abs(r.getDouble(3) - 1.0) < 0.02,
      s"complexity=${r.getDouble(3)}")
    // cv of a zero-mean series is undefined — mean is exactly 0 here
    assert(r.isNullAt(1))
  }

  test("permutation entropy: monotone collapses to one pattern") {
    val mono = SeriesTests.permutationEntropy(
      series((1 to 20).map(_.toDouble))).collect().head
    assert(mono.getLong(0) == 18L && mono.getLong(1) == 1L)
    assert(mono.getDouble(2) == 0.0 && mono.getDouble(3) == 0.0)
    // a series visiting several ordinal patterns has H > 0
    val mixed = SeriesTests.permutationEntropy(
      series(Seq(1, 3, 2, 6, 4, 8, 5, 9, 7, 10).map(_.toDouble)))
      .collect().head
    assert(mixed.getLong(1) > 1L && mixed.getDouble(3) > 0.3)
  }

  // daily COUNT fixture: k_d events on day d
  private def counts(ks: Seq[Int]) =
    ks.zipWithIndex.flatMap { case (k, d) =>
      (1 to k).map(j => ((d * 100 + j).toLong,
        java.sql.Timestamp.valueOf(f"2024-03-${d + 1}%02d 12:00:00"),
        1L, "view", 1.0, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("dispersion index: constant counts underdispersed, bursts over") {
    // perfectly constant daily counts: VMR = 0 → underdispersed
    val flat = SeriesTests.dispersionIndex(counts(Seq.fill(20)(5)))
      .collect().head
    assert(flat.getLong(0) == 20L && flat.getDouble(1) == 5.0)
    assert(flat.getDouble(2) == 0.0 &&
      flat.getString(5) == "underdispersed")
    // one huge burst day among quiet days: VMR ≫ 1
    val burst = SeriesTests.dispersionIndex(
      counts(Seq.fill(19)(5) :+ 200)).collect().head
    assert(burst.getDouble(2) > 10.0 &&
      burst.getString(5) == "overdispersed")
  }

  test("allan deviation: hand-computed tau=1 and flat series") {
    // constant series: every avar is 0, slope NULL
    val flat = SeriesTests.allanDeviation(series(Seq.fill(12)(7.0)))
      .collect().head
    assert(flat.getDouble(1) == 0.0 && flat.getDouble(2) == 0.0 &&
      flat.getDouble(3) == 0.0 && flat.isNullAt(4))
    // alternating 4, 6: mean 5; d1 = ±2 (11 pairs) → avar1 = 2,
    // adev1 = sqrt(2)/5. τ=2 block means all 5 → avar2 = 0.
    val alt = SeriesTests.allanDeviation(series(
      (0 until 12).map(i => if (i % 2 == 0) 4.0 else 6.0)))
      .collect().head
    assert(math.abs(alt.getDouble(1) - math.sqrt(2.0) / 5) < 1e-6)
    assert(alt.getDouble(2) == 0.0)
  }

  test("seasonal strength: pure weekly cycle reads F_S=1, pure trend F_T=1") {
    // exact weekly pattern, flat trend: MA-7 = 40 everywhere, the
    // dow means reproduce the pattern exactly → remainder ≡ 0
    val cycle = Seq.fill(4)(Seq(10.0, 20, 30, 40, 50, 60, 70)).flatten
    val rc = SeriesTests.seasonalStrength(series(cycle)).collect().head
    assert(rc.getLong(0) == 22L, "28 days − 6 edge days")
    assert(rc.getDouble(1) == 0.0, "Var(T+R) = 0 → guarded to 0")
    assert(math.abs(rc.getDouble(2) - 1.0) < 1e-9)
    assert(rc.getString(3) == "seasonal")
    // exact linear trend: MA-7 reproduces it, detrended ≡ 0
    val trend = (1 to 28).map(t => 3.0 * t).toSeq
    val rt = SeriesTests.seasonalStrength(series(trend)).collect().head
    assert(math.abs(rt.getDouble(1) - 1.0) < 1e-9)
    assert(rt.getDouble(2) == 0.0, "Var(S+R) = 0 → guarded to 0")
    assert(rt.getString(3) == "trend")
  }
}
