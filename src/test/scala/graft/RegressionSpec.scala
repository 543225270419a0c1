package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Regression

/** OLS trend recovers a planted line exactly; the breakpoint test
  * finds a planted kink; EB shrinkage pulls small-n rates toward the
  * prior and leaves the estimates inside the data's convex hull. */
class RegressionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(id: Long, day: Int, et: String, v: Double,
      user: Long = 1L) =
    (id, java.sql.Timestamp.valueOf(f"2024-03-$day%02d 09:00:00"),
      user, et, v, "{}")

  private def frame(rows: Seq[(Long, java.sql.Timestamp, Long, String,
      Double, String)]) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("olsTrend recovers an exact planted line: slope, intercept, r2=1") {
    // type "a": y = 100 + 7x over days 1..10 (one event per day);
    // type "b": constant 50 — slope 0, r2 NULL (var_y = 0)
    val e = frame(
      (1 to 10).map(d => ev(d.toLong, d, "a", 100.0 + 7.0 * (d - 1))) ++
      (1 to 10).map(d => ev((100 + d).toLong, d, "b", 50.0)))
    val got = Regression.olsTrend(e).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(a.getLong(1) == 10L)
    assert(math.abs(a.getDouble(2) - 7.0) < 1e-9, "slope")
    assert(math.abs(a.getDouble(3) - 100.0) < 1e-9, "intercept")
    assert(math.abs(a.getDouble(4) - 1.0) < 1e-9, "perfect fit r2")
    val b = got("b")
    assert(math.abs(b.getDouble(2)) < 1e-9, "flat slope")
    assert(b.isNullAt(4), "r2 undefined when var(y)=0")
    assert(b.isNullAt(5), "t undefined when the residual is zero-var")
  }

  test("olsTrend t-stat matches the closed form on a noisy line") {
    // y = 10 + 2x + e with a deterministic +/- 1 alternating residual
    val e = frame((1 to 12).map(d =>
      ev(d.toLong, d, "a",
        10.0 + 2.0 * (d - 1) + (if (d % 2 == 0) 1.0 else -1.0))))
    val r = Regression.olsTrend(e).collect().head
    val xs = (0 until 12).map(_.toDouble)
    val ys = (1 to 12).map(d =>
      10.0 + 2.0 * (d - 1) + (if (d % 2 == 0) 1.0 else -1.0))
    val n = 12.0
    val mx = xs.sum / n; val my = ys.sum / n
    val vx = xs.map(x => (x - mx) * (x - mx)).sum / n
    val cxy = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }
      .sum / n
    val slope = cxy / vx
    val sse = ys.zip(xs).map { case (y, x) =>
      val f = my - slope * mx + slope * x; (y - f) * (y - f) }.sum
    val se = math.sqrt(sse / (n - 2) / (n * vx))
    assert(math.abs(r.getDouble(2) - math.rint(slope * 1e6) / 1e6) < 1e-9)
    assert(math.abs(r.getDouble(5) - slope / se) < 1e-4, "t-stat")
  }

  test("breakpoint finds a planted kink and beats the pooled SSE") {
    // slope 0 for days 1..14 (y=100), slope 20 after (day 15..28):
    // best split at x = 14
    val e = frame((1 to 28).map { d =>
      val y = if (d <= 14) 100.0 else 100.0 + 20.0 * (d - 14)
      ev(d.toLong, d, "a", y)
    })
    val r = Regression.breakpoint(e).collect().head
    val split = r.getLong(0)
    assert(split >= 13L && split <= 15L,
      s"split should land at the kink, got $split")
    assert(r.getDouble(4) < r.getDouble(3),
      "split SSE must beat pooled SSE")
    assert(r.getDouble(5) > 10.0, "the kink should be loudly significant")
  }

  test("breakpoint on a pure line: F stays small and finite") {
    val e = frame((1 to 20).map(d =>
      ev(d.toLong, d, "a",
        50.0 + 3.0 * d + (if (d % 3 == 0) 0.5 else -0.25))))
    val r = Regression.breakpoint(e).collect().head
    assert(!r.isNullAt(5) && r.getDouble(5) >= 0.0)
    assert(r.getLong(2) == 20L, "all days participate")
  }

  test("EB shrinkage pulls the small-n segment toward the prior mean") {
    // users 0..19: even users have 40 events with 10 purchases
    // (p=0.25); odd users have 2 events with 2 purchases (raw p=1.0,
    // tiny evidence — must shrink hard toward the pooled mean)
    val rows = (0 until 20).flatMap { u =>
      if (u % 2 == 0)
        (1 to 40).map(i => ev((u * 100 + i).toLong, i % 28 + 1,
          if (i <= 10) "purchase" else "view", 1.0, u.toLong))
      else
        (1 to 2).map(i => ev((u * 100 + i).toLong, i % 28 + 1,
          "purchase", 1.0, u.toLong))
    }
    val got = Regression.ebShrinkage(frame(rows)).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(2), r.getDouble(3))))
      .toMap
    // global prior mean μ = (10·10 + 2·10)/(40·10 + 2·10) ≈ 0.2857
    val mu = 120.0 / 420.0
    got.foreach { case (seg, (raw, shrunk)) =>
      if (seg % 2 == 1) {
        assert(raw == 1.0, "odd segments are the 2/2 users")
        assert(shrunk < raw && shrunk > mu,
          s"small-n rate must land strictly between prior and raw: $shrunk")
        assert(raw - shrunk > 0.1, "the pull must be material at n=2")
      } else {
        assert(math.abs(raw - 0.25) < 1e-9)
        assert(math.abs(shrunk - 0.25) < math.abs(1.0 - mu),
          "large-n rates move less than small-n rates")
      }
    }
  }

  test("ratio jackknife: hand-checkable two-group case per arm") {
    // arm A (even users 0,2): ratios from groups; arm B (odd 1,3).
    // B=2 groups via user_id % 2... use buckets=2 so groups split
    // users {0,2} → g0={0}, g1={2} wait: user_id % 2 on evens is 0 —
    // use buckets=4: evens → g0={0}, g2={2}; odds → g1={1}, g3={3}
    val units = Seq(
      (0L, 10.0, 100L), (2L, 30.0, 100L),   // arm A: total 40/200
      (1L, 20.0, 100L), (3L, 20.0, 100L))   // arm B: total 40/200
      .toDF("user_id", "x", "y")
    val r = graft.operators.Experiment.ratioJackknife(units,
      col("user_id") % 2 === 1, col("x"), col("y"), col("user_id"),
      buckets = 4).collect().head
    // arm A leave-one-out: drop g0 → 30/100 = .3; drop g2 → 10/100 = .1
    // var_pop = .01, se = sqrt((2-1)*.01) = .1
    // arm B leave-one-out: both 20/100 = .2 → se 0
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 2L && r.getLong(3) == 2L)
    assert(math.abs(r.getDouble(4) - 0.2) < 1e-9, "ratio_a")
    assert(math.abs(r.getDouble(5) - 0.2) < 1e-9, "ratio_b")
    assert(math.abs(r.getDouble(6)) < 1e-9, "lift 0")
    assert(math.abs(r.getDouble(7) - 0.1) < 1e-9, "combined jk se")
    assert(math.abs(r.getDouble(8)) < 1e-9, "z = 0 at zero lift")
    assert(!r.getBoolean(9))
  }

  test("ratio jackknife SE agrees with the delta method in order of magnitude") {
    // deterministic synthetic units: x ~ varies with user, y fixed
    val units = (0 until 200).map { u =>
      (u.toLong, 10.0 + (u % 7).toDouble, 20L + (u % 3))
    }.toDF("user_id", "x", "y")
    val jk = graft.operators.Experiment.ratioJackknife(units,
      col("user_id") % 2 === 1, col("x"), col("y"), col("user_id"))
      .collect().head
    val dm = graft.operators.Experiment.ratioDelta(units,
      col("user_id") % 2 === 1, col("x"), col("y"))
      .collect().head
    val seJk = jk.getDouble(7)
    val seDm = dm.getDouble(5)
    assert(seJk > 0 && seDm > 0)
    assert(seJk / seDm < 3.0 && seDm / seJk < 3.0,
      s"jackknife ($seJk) and delta ($seDm) SEs should be in family")
    // and the point estimates are identical by construction
    assert(math.abs(jk.getDouble(4) - dm.getDouble(2)) < 1e-9)
    assert(math.abs(jk.getDouble(5) - dm.getDouble(3)) < 1e-9)
  }

  test("winsorized Welch: the whale is capped, the clipped share reported") {
    // arm A: 19 users at 10 + one whale at 10000; arm B: 20 users at 12.
    // Uncapped, the whale alone decides the test; capped at pooled
    // p95 the comparison is 10-vs-12 with one clipped unit in A.
    val units = ((0 until 19).map(i => (i.toLong * 2, 10.0)) :+
      (38L, 10000.0)) ++ (0 until 20).map(i => (i.toLong * 2 + 1, 12.0))
    val df = units.toDF("user_id", "m")
    val r = graft.operators.Experiment.winsorizedWelch(df,
      col("user_id") % 2 === 1, col("m")).collect().head
    assert(r.getLong(0) == 20L && r.getLong(1) == 20L)
    assert(r.getLong(3) == 1L, "exactly the whale clips in arm A")
    assert(r.getLong(4) == 0L)
    assert(r.getDouble(6) == 12.0, "arm B untouched")
    assert(r.getDouble(5) < 100.0,
      "the capped arm-A mean is no longer whale-dominated")
    // threshold sits at the bulk's edge, far below the whale
    // ((n−1)p = 37.05 interpolates inside the run of 12s → exactly 12)
    assert(r.getDouble(2) >= 12.0 && r.getDouble(2) < 10000.0)
  }

  test("winsorized Welch: degenerate constant metric is flat, not NaN") {
    val df = (0 until 10).map(i => (i.toLong, 5.0)).toDF("user_id", "m")
    val r = graft.operators.Experiment.winsorizedWelch(df,
      col("user_id") % 2 === 1, col("m")).collect().head
    assert(r.getDouble(7) == 0.0, "zero lift")
    assert(r.isNullAt(8), "t undefined at zero variance")
    assert(!r.getBoolean(9))
  }

  test("NB fit: overdispersed counts get a fit, Poisson-ish gets NULL") {
    // type "od": daily counts alternate 2 and 18 → μ=10, σ²=64 ≫ μ
    // (planted overdispersion); type "flat": constant 4 → σ²=0 < μ
    val rows = (1 to 20).flatMap { d =>
      val n = if (d % 2 == 0) 18 else 2
      (1 to n).map(j => ((d * 100 + j).toLong,
        java.sql.Timestamp.valueOf(f"2024-03-$d%02d 09:00:00"),
        1L, "od", 1.0, "{}"))
    } ++ (1 to 20).flatMap { d =>
      (1 to 4).map(j => ((9000 + d * 10 + j).toLong,
        java.sql.Timestamp.valueOf(f"2024-03-$d%02d 09:00:00"),
        1L, "flat", 1.0, "{}"))
    }
    val got = graft.operators.Anomaly.negativeBinomialFit(frame(rows))
      .collect().map(r => r.getString(0) -> r).toMap
    val od = got("od")
    assert(math.abs(od.getDouble(2) - 10.0) < 1e-9)
    assert(math.abs(od.getDouble(3) - 64.0) < 1e-9)
    // r = μ²/(σ²−μ) = 100/54; p = μ/σ² = 10/64
    assert(math.abs(od.getDouble(4) - 100.0 / 54.0) < 1e-5)
    assert(math.abs(od.getDouble(5) - 10.0 / 64.0) < 1e-6)
    // the fitted threshold is far above the Poisson one
    assert(od.getDouble(6) > od.getDouble(7) + 10.0)
    val fl = got("flat")
    assert(fl.isNullAt(4) && fl.isNullAt(5),
      "under-dispersed counts have no NB fit")
  }

  test("EB fallback: identical users (zero rate variance) use M=100") {
    val rows = (0 until 6).flatMap { u =>
      (1 to 4).map(i => ev((u * 10 + i).toLong, i,
        if (i == 1) "purchase" else "view", 1.0, u.toLong))
    }
    val got = Regression.ebShrinkage(frame(rows)).collect()
    // all users identical at p=0.25 = μ: posterior must equal raw
    got.foreach { r =>
      assert(math.abs(r.getDouble(2) - 0.25) < 1e-9)
      assert(math.abs(r.getDouble(3) - 0.25) < 1e-9,
        "shrinking toward your own mean is a no-op")
    }
  }

  test("breusch-pagan: exact fit is NULL, fanning residuals reject") {
    // perfect line: residuals identically 0 → var(e²) = 0 → LM NULL
    val exact = frame(
      (1 to 12).map(d => ev(d.toLong, d, "a", 100.0 + 7.0 * (d - 1))))
    val r0 = Regression.breuschPagan(exact).collect().head
    assert(r0.isNullAt(2) && r0.isNullAt(3))
    // fan shape: y = x ± 0.5x alternating — residual² grows with x
    val fan = frame((1 to 20).map { d =>
      val x = (d - 1).toDouble
      val amp = if (d % 2 == 0) 0.5 else -0.5
      ev(d.toLong, d, "a", x + amp * x)
    })
    val r1 = Regression.breuschPagan(fan).collect().head
    // independent recomputation of Koenker's LM from the raw series
    val xs = (0 until 20).map(_.toDouble)
    val ys = (1 to 20).map { d =>
      val x = (d - 1).toDouble
      x + (if (d % 2 == 0) 0.5 else -0.5) * x
    }
    val n = xs.size.toDouble
    val mx = xs.sum / n; val my = ys.sum / n
    val vx = xs.map(x => (x - mx) * (x - mx)).sum / n
    val cxy = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }
      .sum / n
    val b = cxy / vx; val a = my - b * mx
    val e2 = xs.zip(ys).map { case (x, y) =>
      val e = y - (a + b * x); e * e }
    val me = e2.sum / n
    val ve = e2.map(e => (e - me) * (e - me)).sum / n
    val cex = e2.zip(xs).map { case (e, x) => (e - me) * (x - mx) }
      .sum / n
    val lm = n * cex * cex / (ve * vx)
    assert(r1.getLong(1) == 20L)
    assert(math.abs(r1.getDouble(2) - lm) < 1e-5,
      s"lm: ${r1.getDouble(2)} vs $lm")
    assert(r1.getBoolean(3) == (lm > 3.841459))
  }

  test("hac trend: NW se widens under positive serial correlation") {
    // y = 5t + 40·square-wave(period 12): residuals are sticky
    // blocks → brute (offline): slope 5.0, se_ols 0.427856,
    // se_nw 0.570044, t_ols 11.686182, t_nw 8.771249 at l = 2
    val ys = (1 to 30).map(t => 5.0 * t + 40.0 * (((t - 1) / 6) % 2))
    val df = frame(ys.zipWithIndex.map { case (v, i) =>
      ev(i.toLong, i + 1, "view", v) })
    val r = Regression.hacTrend(df).collect().head
    assert(r.getLong(0) == 30L && r.getLong(1) == 2L)
    assert(math.abs(r.getDouble(2) - 5.0) < 1e-6)
    assert(math.abs(r.getDouble(3) - 0.427856) < 1e-5)
    assert(math.abs(r.getDouble(4) - 0.570044) < 1e-5)
    assert(math.abs(r.getDouble(5) - 11.686182) < 1e-4)
    assert(math.abs(r.getDouble(6) - 8.771249) < 1e-4)
    assert(r.getDouble(4) > r.getDouble(3),
      "positive autocorrelation must WIDEN the robust se")
    assert(r.getBoolean(7))
    // an exact line: zero residuals → se_nw degenerates to NULL
    val exact = Regression.hacTrend(frame((1 to 30).map(t =>
      ev(t.toLong, t, "view", 3.0 * t)))).collect().head
    assert(exact.isNullAt(4) && exact.isNullAt(6) &&
      !exact.getBoolean(7))
  }
}
