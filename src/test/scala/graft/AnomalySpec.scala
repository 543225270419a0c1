package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Anomaly

/** Boundary semantics of the rolling z-score flag: the PUBLISHED z is
  * rounded to 4 decimals for oracle stability, but the flag must test
  * the RAW quotient — a flag computed from the rounded value would
  * silently pass raw |z| in (thr, thr + 0.00005). */
class AnomalySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def series(last: Double) =
    Seq(0.0, 0.0, 0.0, 0.0, 1.0, last).zipWithIndex
      .map { case (v, i) => ("k", f"2024-01-${i + 1}%02d", v) }
      .toDF("key", "dt", "v")

  private def lastRow(last: Double): (Double, Boolean) = {
    val r = Anomaly.rollingZScore(series(last), "key", "dt", "v",
      trailingRows = 6, zThreshold = 2.0)
      .select("z", "anomaly").collect().last
    (r.getDouble(0), r.getBoolean(1))
  }

  test("flag fires on raw |z| just ABOVE threshold even when the rounded z displays exactly 2.0") {
    // [0,0,0,0,1,5.0012]: raw z = 2.0000199..., round(z,4) = 2.0
    val (z, flag) = lastRow(5.0012)
    assert(z == 2.0, s"published z should round to the threshold, got $z")
    assert(flag, "raw z 2.00002 > 2.0 must flag despite displaying 2.0")
  }

  test("flag stays off on raw |z| just BELOW threshold that also displays 2.0") {
    // [0,0,0,0,1,4.9988]: raw z = 1.9999799..., round(z,4) = 2.0
    val (z, flag) = lastRow(4.9988)
    assert(z == 2.0, s"published z should round to the threshold, got $z")
    assert(!flag, "raw z 1.99998 < 2.0 must not flag even though it displays 2.0")
  }

  test("windows with fewer than 2 points have no stddev and flag false") {
    val r = Anomaly.rollingZScore(series(5.0012), "key", "dt", "v",
      trailingRows = 6, zThreshold = 2.0)
      .select("z", "anomaly").collect().head
    assert(r.isNullAt(0) && !r.getBoolean(1))
  }
}
