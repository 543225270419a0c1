package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.EventTime

/** Disorder-profile correctness on hand-built streams: an in-order
  * stream reports zero lateness, a known late row is measured
  * against the PREVIOUS bucket's high-water mark (conservative,
  * never over-reported), and the suggested watermark is ceil(p99). */
class EventTimeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def events(rows: (Long, String, String)*) =
    rows.toDF("event_id", "ts_s", "event_type")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")

  test("a perfectly ordered stream has zero lateness everywhere") {
    val ev = events((1 to 50).map(i =>
      (i.toLong, f"2024-01-01 00:00:${i % 60}%02d", "a")): _*)
    val r = EventTime.disorderProfile(ev, bucketSize = 10).collect()(0)
    assert(r.getAs[Double]("late_frac") == 0.0)
    assert(r.getAs[Long]("max_late_s") == 0L)
    assert(r.getAs[Long]("watermark_s") == 0L)
  }

  test("lateness is measured against the previous bucket's high-water mark") {
    // bucket 0 (ids 0..9) tops out at 00:01:40 (100 s); bucket 1
    // contains one row 30 s behind that → late_s = 70 for it, and 0
    // for same-bucket disorder (conservative by construction).
    val base = (0 to 9).map(i =>
      (i.toLong, s"2024-01-01 00:01:${31 + i}", "a")) // 91..100 s
    val b1 = Seq(
      (10L, "2024-01-01 00:00:30", "a"), // es=30, hwm=100 -> late 70
      (11L, "2024-01-01 00:02:00", "a")) // ahead of hwm -> late 0
    val r = EventTime.disorderProfile(events(base ++ b1: _*),
      bucketSize = 10).collect()(0)
    assert(r.getAs[Long]("max_late_s") == 70L, s"got $r")
    // exactly 1 of 12 rows late
    assert(math.abs(r.getAs[Double]("late_frac") - 1.0 / 12) < 1e-6)
  }

  test("same-bucket disorder is invisible (the estimate never over-reports)") {
    // all disorder inside bucket 0; no previous bucket -> all late 0
    val ev = events((50L, "2024-01-01 00:05:00", "a"),
      (51L, "2024-01-01 00:00:00", "a"))
    val r = EventTime.disorderProfile(ev, bucketSize = 100).collect()(0)
    assert(r.getAs[Long]("max_late_s") == 0L)
  }

  test("watermark_s is ceil of the p99 lateness") {
    val r = EventTime.disorderProfile(
      events((0L, "2024-01-01 00:10:00", "a"),
        (10L, "2024-01-01 00:09:30", "a"),
        (11L, "2024-01-01 00:09:00", "a"),
        (12L, "2024-01-01 00:10:01", "a")), bucketSize = 10)
      .collect()(0)
    val p99 = r.getAs[Double]("p99_late_s")
    assert(r.getAs[Long]("watermark_s") == math.ceil(p99).toLong)
    assert(r.getAs[Long]("max_late_s") == 60L)
  }

  test("profile is split per event_type") {
    val ev = events((0L, "2024-01-01 00:10:00", "a"),
      (10L, "2024-01-01 00:09:00", "b"),
      (11L, "2024-01-01 00:11:00", "a"))
    val m = EventTime.disorderProfile(ev, bucketSize = 10).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("max_late_s")).toMap
    assert(m == Map("a" -> 0L, "b" -> 60L), s"got $m")
  }
}
