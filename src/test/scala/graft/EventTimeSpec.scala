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

  private def userEvents(rows: (Long, Long, Long, String)*) =
    rows.toDF("event_id", "user_id", "ts_s", "event_type")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")

  test("burstiness: a metronome user scores −1 exactly") {
    // constant 10 s gaps → σ = 0, B = (0 − 10)/(0 + 10) = −1
    val ev = userEvents((0 until 8).map(i =>
      (i.toLong, 1L, 100L + 10L * i, "click")): _*)
    val r = EventTime.burstiness(ev, minEvents = 5).collect()(0)
    assert(r.getAs[Long]("n_users") == 1L)
    assert(r.getAs[Double]("mean_burstiness") == -1.0)
  }

  test("burstiness: burst-and-silence scores high; hand-computed moments") {
    // gaps 1,1,1,1,1000: μ = 200.8, E[x²] = 200000.8,
    // σ = sqrt(E[x²] − μ²) — population moments, matching the engine
    val times = Seq(0L, 1L, 2L, 3L, 4L, 1004L)
    val ev = userEvents(times.zipWithIndex.map { case (t, i) =>
      (i.toLong, 7L, t, "view") }: _*)
    val gaps = times.sliding(2).map { case Seq(a, b) => (b - a).toDouble }.toSeq
    val mu = gaps.sum / gaps.size
    val m2 = gaps.map(g => g * g).sum / gaps.size
    val sd = math.sqrt(m2 - mu * mu)
    val expect = BigDecimal((sd - mu) / (sd + mu))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = EventTime.burstiness(ev, minEvents = 5).collect()(0)
    assert(r.getAs[Double]("mean_burstiness") == expect)
    // the finite-size ceiling for 5 gaps is (√4−1)/(√4+1) = 1/3
    // (one giant gap among n is the burstiest a 5-gap series can be);
    // the series should sit essentially at it
    assert(expect > 0.33)
  }

  test("burstiness: users below minEvents are excluded; types independent") {
    val ev = userEvents(
      // user 1: 6 'a' events (kept); user 2: 3 'a' events (dropped);
      // user 1 also has 2 'b' events (dropped for b)
      (0 until 6).map(i => (i.toLong, 1L, 10L * i, "a")) ++
        Seq((10L, 2L, 0L, "a"), (11L, 2L, 5L, "a"), (12L, 2L, 9L, "a"),
          (20L, 1L, 0L, "b"), (21L, 1L, 50L, "b")): _*)
    val got = EventTime.burstiness(ev, minEvents = 5).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_users")).toMap
    assert(got == Map("a" -> 1L))
  }
}
