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
}
