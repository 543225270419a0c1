package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
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

  test("seasonal z: a spike at ITS OWN quiet hour flags; the same value at a busy hour does not") {
    import spark.implicits._
    // baseline days 1-4: hour 2 runs at ~10/day, hour 14 at ~100/day
    // (slight jitter so sd > 0); day 5: BOTH hours read 100.
    val rows =
      (1 to 4).flatMap { d =>
        Seq((d.toLong * 10, f"2024-01-0$d%d 02:00:00", "click", 10.0 + d * 0.1),
          (d.toLong * 10 + 1, f"2024-01-0$d%d 14:00:00", "click", 100.0 + d * 0.1))
      } ++ Seq(
        (900L, "2024-01-05 02:00:00", "click", 100.0),
        (901L, "2024-01-05 14:00:00", "click", 100.0))
    val ev = rows.toDF("event_id", "ts_s", "event_type", "value")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val got = Anomaly.seasonalZScore(ev, splitDay = 4, zThreshold = 3.0)
      .collect().map(r => r.getInt(2) -> r.getAs[Boolean]("anomaly")).toMap
    assert(got(2), "100 at the quiet 2am hour must flag")
    assert(!got(14), "100 at the busy 2pm hour is in-profile")
  }

  test("seasonal z: a zero-spread baseline fails safe (no flag, null z)") {
    import spark.implicits._
    val rows = (1 to 3).map(d =>
      (d.toLong, f"2024-01-0$d%d 05:00:00", "view", 50.0)) ++
      Seq((99L, "2024-01-09 05:00:00", "view", 9999.0))
    val ev = rows.toDF("event_id", "ts_s", "event_type", "value")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val r = Anomaly.seasonalZScore(ev, splitDay = 4).collect()
    assert(r.length == 1)
    assert(!r(0).getAs[Boolean]("anomaly"))
    assert(r(0).isNullAt(r(0).fieldIndex("z")))
  }
}
