package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Anomaly, Funnel, Sessionize}

/** Hand-computed session-summary, funnel-latency, and Wilson-SLO
  * cases. */
class WebMetricsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(id: Long, user: Long, minute: Int, et: String) =
    (id, java.sql.Timestamp.valueOf(f"2024-03-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00"),
      user, et, 1.0, "{}")

  private def frame(rows: Seq[(Long, java.sql.Timestamp, Long, String,
      Double, String)]) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("session summary: bounces, depth, entry/exit under tied timestamps") {
    // u1 session A: view@0 → click@10 → purchase@20 (entry view,
    // exit purchase, 3 events, 1200 s). u1 session B after a >30 min
    // gap: single view@60 (bounce, exit = entry).
    // u2: two SAME-timestamp events — event_id breaks the tie:
    // entry = id 10 (view), exit = id 11 (click)
    val e = frame(Seq(
      ev(1, 1, 0, "view"), ev(2, 1, 10, "click"),
      ev(3, 1, 20, "purchase"),
      ev(4, 1, 60, "view"),
      ev(10, 2, 5, "view"), ev(11, 2, 5, "click")))
    val got = Sessionize.sessionSummary(e, gapSeconds = 1800)
      .select("entry_type", "n_sessions", "bounces", "bounce_rate",
        "avg_events", "p50_duration_s", "exit_same_share")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    // all three sessions enter on "view"
    val v = got("view")
    assert(v._1 == 3L && v._2 == 1L)
    assert(v._3 == BigDecimal(1.0 / 3).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(v._4 == 2.0, "depths 3, 1, 2 average 2")
    assert(v._5 == 0.0, "median duration of (1200, 0, 0) is 0")
    // exit equals entry only for the bounce
    assert(v._6 == BigDecimal(1.0 / 3).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("funnel latency: hand-computed diffs, non-converters excluded") {
    // u1: view@0, click@10, purchase@40 → d12 = 600 s, d23 = 1800 s
    // u2: view@0, click@30 → d12 = 1800 s, no purchase
    // u3: purchase@5 only — never enters the funnel
    val e = frame(Seq(
      ev(1, 1, 0, "view"), ev(2, 1, 10, "click"),
      ev(3, 1, 40, "purchase"),
      ev(4, 2, 0, "view"), ev(5, 2, 30, "click"),
      ev(6, 3, 5, "purchase")))
    val got = Funnel.stepLatency(e, Seq("view", "click", "purchase"))
      .select("step_from", "n_users", "mean_s", "p50_s")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got(1) == ((2L, 1200.0, 1200.0)))
    assert(got(2) == ((1L, 1800.0, 1800.0)))
  }

  test("wilson slo: small clean day cannot breach, big dirty day does") {
    // day 1: 4 events, 1 error → rate 0.25 but the interval is huge
    // (lower bound ~0.046) → no breach at slo 0.25
    // day 2: 400 events, 160 errors → rate 0.4, lower ~0.353 → breach
    val e = frame(
      Seq(ev(1, 1, 0, "error"), ev(2, 1, 1, "view"),
        ev(3, 1, 2, "view"), ev(4, 1, 3, "view")) ++
        (1 to 400).map(i => (100L + i,
          java.sql.Timestamp.valueOf("2024-03-02 10:00:00"),
          (i % 7).toLong, if (i <= 160) "error" else "view", 1.0, "{}")))
    val got = Anomaly.errorSlo(e)
      .select("d", "rate", "wilson_lo", "wilson_hi", "breach")
      .collect().map(r => r.getDate(0).toString ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3),
          r.getBoolean(4)))).toMap
    val d1 = got("2024-03-01")
    assert(d1._1 == 0.25 && !d1._4,
      s"4-event day must not breach on one error: $d1")
    assert(d1._2 < 0.05 && d1._3 > 0.6, "tiny n → wide interval")
    val d2 = got("2024-03-02")
    assert(d2._1 == 0.4 && d2._4, s"big dirty day must breach: $d2")
    assert(d2._2 > 0.25 && d2._2 < 0.4)
  }
}
