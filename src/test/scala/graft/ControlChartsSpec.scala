package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{ControlCharts, Drift}

class ControlChartsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def events(rows: Seq[(Int, String, Double)]) =
    rows.zipWithIndex.map { case ((day, et, v), i) =>
      (i.toLong, java.sql.Timestamp.valueOf(
        f"2024-03-$day%02d 12:00:00"), 1L, et, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("imr chart: hand-computed limits and a planted spike") {
    // daily series 10,12,10,12,10,12,10,12,10,50:
    // x̄ = 14.8; MRs = 2×8 and 40 → M̄R = 56/9
    val days = Seq(10.0, 12, 10, 12, 10, 12, 10, 12, 10, 50)
    val df = events(days.zipWithIndex.map { case (v, i) =>
      (i + 1, "view", v) })
    val r = ControlCharts.imrChart(df).collect().head
    assert(r.getLong(0) == 10L)
    assert(math.abs(r.getDouble(1) - 14.8) < 1e-6)
    assert(math.abs(r.getDouble(2) - 56.0 / 9) < 1e-6)
    val ucl = 14.8 + 2.66 * 56 / 9
    assert(math.abs(r.getDouble(3) - ucl) < 1e-6)
    // only the 50 exceeds UCL ≈ 31.35; LCL ≈ −1.75 never hit
    assert(r.getLong(5) == 1L)
    // MR limit 3.267·M̄R ≈ 20.3: only the 40 jump exceeds
    assert(r.getLong(6) == 1L)
    // a stable series has zero violations
    val stable = ControlCharts.imrChart(events(
      (1 to 10).map(d => (d, "view", 10.0 + (d % 2))))).collect().head
    assert(stable.getLong(5) == 0L && stable.getLong(6) == 0L)
  }

  test("p chart: a planted bad day crosses its varying limit") {
    // 9 days with 1/10 errors, day 10 with 9/10 errors
    val rows = (1 to 9).flatMap(d =>
      (1 to 9).map(_ => (d, "view", 1.0)) :+ (d, "error", 1.0)) ++
      ((1 to 9).map(_ => (10, "error", 1.0)) :+ (10, "view", 1.0))
    val r = ControlCharts.pChart(events(rows)).collect().head
    assert(r.getLong(0) == 10L && r.getLong(2) == 100L)
    assert(math.abs(r.getDouble(1) - 0.18) < 1e-9)
    // limits at n=10: 0.18 ± 3·sqrt(0.18·0.82/10) ≈ 0.18 ± 0.3645 —
    // day 10 (0.9) is out high; no day is out low (floor < 0)
    assert(r.getLong(3) == 1L && r.getLong(4) == 0L)
  }

  test("histogram distances: identical cohorts are 0, disjoint are 1") {
    val df = Seq((false, 15.0), (false, 25.0), (true, 15.0),
      (true, 25.0)).toDF("b", "m")
    val r0 = Drift.histogramDistances(df, col("b"), col("m"))
      .collect().head
    assert(r0.getDouble(3) == 0.0 &&
      math.abs(r0.getDouble(4) - 1.0) < 1e-9 && r0.getDouble(5) == 0.0)
    val disjoint = Seq((false, 15.0), (false, 25.0), (true, 115.0),
      (true, 125.0)).toDF("b", "m")
    val r1 = Drift.histogramDistances(disjoint, col("b"), col("m"))
      .collect().head
    assert(r1.getDouble(3) == 1.0 && r1.getDouble(4) == 0.0 &&
      r1.getDouble(5) == 1.0)
    // half-overlap: p = (.5,.5,0), q = (0,.5,.5) → TV = .5,
    // BC = .5, H = sqrt(.5)
    val half = Seq((false, 15.0), (false, 25.0), (true, 25.0),
      (true, 35.0)).toDF("b", "m")
    val rh = Drift.histogramDistances(half, col("b"), col("m"))
      .collect().head
    assert(rh.getDouble(3) == 0.5 &&
      math.abs(rh.getDouble(4) - 0.5) < 1e-9 &&
      math.abs(rh.getDouble(5) - math.sqrt(0.5)) < 1e-6)
    // top-clamp: values ≥ 500 land in bin 49 on both sides
    val clamp = Seq((false, 9999.0), (true, 600.0)).toDF("b", "m")
    val rc = Drift.histogramDistances(clamp, col("b"), col("m"))
      .collect().head
    assert(rc.getLong(2) == 1L && rc.getDouble(3) == 0.0)
  }

  test("cressie-read: identical mixes accept, a shifted mix rejects, " +
    "and lambda=1 reduces to pearson chi2") {
    // identical category mixes in both cohorts → CR = 0 exactly
    val same = (for (b <- Seq(false, true); c <- Seq("x", "y", "z");
      _ <- 1 to 10) yield (b, c)).toDF("b", "c")
    val r0 = Drift.cressieRead(same, col("b"), col("c"))
      .collect().head
    assert(r0.getLong(0) == 3L && r0.getDouble(3) == 0.0 &&
      !r0.getBoolean(4))
    // strongly shifted mix rejects
    val shift = ((1 to 90).map(_ => (false, "x")) ++
      (1 to 10).map(_ => (false, "y")) ++
      (1 to 10).map(_ => (true, "x")) ++
      (1 to 90).map(_ => (true, "y"))).toDF("b", "c")
    val r1 = Drift.cressieRead(shift, col("b"), col("c"))
      .collect().head
    assert(r1.getBoolean(4), s"cr=${r1.getDouble(3)}")
    // λ = 1 IS Pearson's χ²: replay a hand 2x2 — cells a=30,b=10 /
    // c=10,d=30: chi2 = n(ad−bc)²/(r1 r2 c1 c2) = 80·(800)²/40⁴
    val hand = ((1 to 30).map(_ => (false, "x")) ++
      (1 to 10).map(_ => (false, "y")) ++
      (1 to 10).map(_ => (true, "x")) ++
      (1 to 30).map(_ => (true, "y"))).toDF("b", "c")
    val chi2 = 80.0 * math.pow(30.0 * 30 - 10.0 * 10, 2) /
      (40.0 * 40 * 40 * 40)
    val rP = Drift.cressieRead(hand, col("b"), col("c"), lambda = 1.0)
      .collect().head
    assert(math.abs(rP.getDouble(3) - chi2) < 1e-6,
      s"cr=${rP.getDouble(3)} chi2=$chi2")
  }

  test("poisson rate ratio: equal rates accept, a 3x rate rejects") {
    def ev(day: Int, weekend: Boolean, k: Int, id0: Long) = {
      // weekend flag realized through the actual date: 2024-03-02/03
      // are Sat/Sun; 2024-03-04..08 are weekdays
      val dates = if (weekend) Seq(2, 3) else Seq(4, 5, 6, 7, 8)
      val d = dates(day % dates.size)
      (0 until k).map(i => (id0 + i, java.sql.Timestamp.valueOf(
        f"2024-03-$d%02d 10:00:00"), 1L, "error", 1.0, "{}"))
    }
    import graft.operators.Drift
    // 5 weekday days × 20/day vs 2 weekend days × 20/day: same rate
    val eq = ((0 until 5).flatMap(d => ev(d, weekend = false, 20,
      d * 1000L)) ++ (0 until 2).flatMap(d => ev(d, weekend = true,
      20, 100000L + d * 1000L)))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r0 = Drift.poissonRateRatio(eq,
      dayofweek(col("ts")).isin(1, 7)).collect().head
    assert(r0.getLong(2) == 5L && r0.getLong(3) == 2L)
    assert(r0.getDouble(4) == 20.0 && r0.getDouble(5) == 20.0)
    assert(r0.getDouble(6) == 1.0 && !r0.getBoolean(8))
    // weekend rate 3x: 60/day on 2 weekend days
    val hot = ((0 until 5).flatMap(d => ev(d, weekend = false, 20,
      d * 1000L)) ++ (0 until 2).flatMap(d => ev(d, weekend = true,
      60, 100000L + d * 1000L)))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r1 = Drift.poissonRateRatio(hot,
      dayofweek(col("ts")).isin(1, 7)).collect().head
    assert(math.abs(r1.getDouble(6) - 20.0 / 60) < 1e-6)
    assert(r1.getBoolean(8), s"z=${r1.getDouble(7)}")
  }

  test("c chart: spike out high, LCL floored at zero") {
    // 9 days × 4 errors + 1 day × 16: c̄ = 5.2, UCL ≈ 12.04 —
    // day 10 out; LCL = max(0, 5.2 − 6.84) = 0, nothing below
    val rows = (1 to 9).flatMap(d => (1 to 4).map(_ =>
      (d, "error", 1.0)) :+ (d, "view", 1.0)) ++
      ((1 to 16).map(_ => (10, "error", 1.0)) :+ (10, "view", 1.0))
    val r = ControlCharts.cChart(events(rows)).collect().head
    assert(r.getLong(0) == 10L)
    assert(math.abs(r.getDouble(1) - 5.2) < 1e-9)
    assert(r.getDouble(3) == 0.0, "LCL floored at 0")
    assert(r.getLong(4) == 1L && r.getLong(5) == 0L)
    // big center: LCL > 0 and a quiet day drops below it
    // (9 days × 16 + 1 day × 1: c̄ = 14.5, LCL ≈ 3.08)
    val rows2 = (1 to 9).flatMap(d => (1 to 16).map(_ =>
      (d, "error", 1.0))) :+ ((10, "error", 1.0))
    val r2 = ControlCharts.cChart(events(rows2)).collect().head
    assert(math.abs(r2.getDouble(1) - 14.5) < 1e-9)
    assert(r2.getDouble(3) > 0.0)
    assert(r2.getLong(4) == 0L && r2.getLong(5) == 1L)
  }

  test("u chart: varying exposure — the small day needs a wild rate") {
    // days 1-5: 10 users / 1 error; day 6: 2 users / 3 errors.
    // ū = 8/52; day-6 limit ≈ 0.154 + 3·√(ū/2) ≈ 0.986 < 1.5
    def ev(d: Int, u: Long, et: String) = (u,
      java.sql.Timestamp.valueOf(f"2024-03-$d%02d 12:00:00"), et, 1.0)
    val rows =
      (1 to 5).flatMap { d =>
        (1L to 10L).map(u => ev(d, u, "view")) :+ ev(d, 1L, "error")
      } ++ (1L to 2L).map(u => ev(6, u, "view")) ++
        Seq(ev(6, 1L, "error"), ev(6, 2L, "error"), ev(6, 1L, "error"))
    val df = rows.toDF("user_id", "ts", "event_type", "value")
    val r = ControlCharts.uChart(df).collect().head
    assert(r.getLong(0) == 6L)
    assert(math.abs(r.getDouble(1) - 8.0 / 52) < 1e-6)
    assert(r.getLong(2) == 8L)
    assert(r.getLong(3) == 1L && r.getLong(4) == 0L)
  }

  private def wecoBrute(ys: Seq[Double]):
      (Double, Double, Long, Long, Long, Long) = {
    val n = ys.length
    val xbar = ys.sum / n
    val mrs = ys.sliding(2).map(p => math.abs(p(1) - p(0))).toSeq
    val sig = mrs.sum / mrs.size / 1.128
    val zs = ys.map(y => (y - xbar) / sig)
    def fires(t: Int, w: Int, k: Double, need: Int) = {
      if (t < w - 1) false
      else {
        val win = zs.slice(t - w + 1, t + 1)
        win.count(_ > k) >= need || win.count(-_ > k) >= need
      }
    }
    val r1 = zs.count(z => math.abs(z) > 3.0).toLong
    val r2 = zs.indices.count(fires(_, 3, 2.0, 2)).toLong
    val r3 = zs.indices.count(fires(_, 5, 1.0, 4)).toLong
    val r4 = zs.indices.count(fires(_, 8, 0.0, 8)).toLong
    (xbar, sig, r1, r2, r3, r4)
  }

  test("weco rules: planted run-of-8 fires rule 4, brute-force agrees") {
    // 8 alternating days around 11, then 8 days alternating around
    // 17 — a sustained shift no single point pushes past 3σ
    val ys = Seq(10.0, 12, 10, 12, 10, 12, 10, 12,
      16.0, 18, 16, 18, 16, 18, 16, 18)
    val df = events(ys.zipWithIndex.map { case (v, i) =>
      (i + 1, "view", v) })
    val r = ControlCharts.wecoRules(df).collect().head
    val (xbar, sig, r1, r2, r3, r4) = wecoBrute(ys)
    assert(r.getLong(0) == 16L)
    assert(math.abs(r.getDouble(1) - xbar) < 1e-6)
    assert(math.abs(r.getDouble(2) - sig) < 1e-6)
    assert(r.getLong(3) == r1 && r.getLong(4) == r2 &&
      r.getLong(5) == r3 && r.getLong(6) == r4)
    assert(r4 >= 1L, "the sustained shift must fire rule 4")
    assert(r1 == 0L, "no single point is a 3-sigma outlier")
    // a stable alternating series fires nothing
    val calm = Seq.fill(8)(Seq(10.0, 12)).flatten
    val rc = ControlCharts.wecoRules(events(calm.zipWithIndex.map {
      case (v, i) => (i + 1, "view", v) })).collect().head
    val (_, _, c1, c2, c3, c4) = wecoBrute(calm)
    assert(rc.getLong(3) == c1 && rc.getLong(4) == c2 &&
      rc.getLong(5) == c3 && rc.getLong(6) == c4)
    assert(c1 == 0L && c2 == 0L && c3 == 0L && c4 == 0L)
  }
}
