package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Anomaly, Basket, Forecast, Matching, Survival}

/** Nelson–Aalen/Greenwood, CEM ATT, forecast tournament, PACF, and
  * link-prediction eval on hand-checkable fixtures. */
class ForecastEvalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(rows: (Long, String, String, Double)*) =
    rows.map { case (u, t, e, v) =>
      (u, java.sql.Timestamp.valueOf(t), e, v)
    }.toDF("user_id", "ts", "event_type", "value")

  test("nelson-aalen hazard, NA survival and greenwood SE by hand") {
    val d = ev(
      (1L, "2024-06-01 08:00:00", "view", 0), (1L, "2024-06-03 08:00:00", "view", 0),
      (2L, "2024-06-01 08:00:00", "view", 0), (2L, "2024-06-05 08:00:00", "view", 0),
      (3L, "2024-06-02 08:00:00", "view", 0), (3L, "2024-06-09 08:00:00", "view", 0),
      (4L, "2024-06-10 08:00:00", "view", 0))
    val r = Survival.nelsonAalen(d, horizonDays = 3)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r.keySet == Set(2L, 4L), "only uncensored-exit lifetimes")
    assert(r(2L).getLong(1) == 3L && r(2L).getLong(2) == 1L)
    assert(math.abs(r(2L).getDouble(3) - 1.0 / 3.0) < 1e-6)
    assert(math.abs(r(2L).getDouble(4) - math.exp(-1.0 / 3.0)) < 1e-6)
    assert(math.abs(r(2L).getDouble(5) -
      2.0 / 3.0 * math.sqrt(1.0 / 6.0)) < 1e-6)
    assert(math.abs(r(4L).getDouble(3) - (1.0 / 3.0 + 0.5)) < 1e-6)
    assert(math.abs(r(4L).getDouble(5) -
      1.0 / 3.0 * math.sqrt(1.0 / 6.0 + 0.5)) < 1e-6)
  }

  test("cem att weights matched strata by treated counts") {
    // stratum = active days; treated = saw an error
    val d = ev(
      // s=1 treated: u1 y=10, u2 y=20; control: u3 y=5
      (1L, "2024-06-01 08:00:00", "error", 0),
      (1L, "2024-06-01 09:00:00", "purchase", 10),
      (2L, "2024-06-02 08:00:00", "error", 0),
      (2L, "2024-06-02 09:00:00", "purchase", 20),
      (3L, "2024-06-03 08:00:00", "purchase", 5),
      // s=2 treated only: u4 (unmatched)
      (4L, "2024-06-01 08:00:00", "error", 0),
      (4L, "2024-06-02 09:00:00", "purchase", 8))
    val r = Matching.errorImpactAtt(d).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 1L)
    assert(r.getLong(2) == 2L && r.getLong(3) == 1L)
    assert(r.getLong(4) == 2L)
    assert(math.abs(r.getDouble(5) - 10.0) < 1e-9, "att")
    // naive: treated mean (10+20+8)/3, control mean 5
    assert(math.abs(r.getDouble(6) - (38.0 / 3.0 - 5.0)) < 1e-6)
  }

  test("tournament: snaive wins on a perfectly 7-periodic series") {
    val pattern = Seq(10.0, 40.0, 20.0, 50.0, 30.0, 60.0, 25.0)
    val rows = (0 until 21).map { i =>
      (i.toLong, f"2024-06-${i + 1}%02d 10:00:00", "view", pattern(i % 7))
    }
    val r = Forecast.tournament(ev(rows: _*))
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("naive").getLong(1) == 14L, "common window = days 8..21")
    assert(math.abs(r("naive").getDouble(3) - 1.0) < 1e-9)
    assert(r("snaive").getDouble(2) == 0.0, "periodic → snaive exact")
    assert(r("holt").getDouble(2) > 0.0 && r("ses").getDouble(2) > 0.0)
  }

  test("pacf lag-2 matches the closed form on its own acf") {
    // dailyAcf runs on COUNTS per day — vary them (1..15 events/day)
    val rows = (0 until 24).flatMap { i =>
      (0 until (1 + i % 3 * 7 + i % 5)).map { j =>
        ((i * 100 + j).toLong, f"2024-06-${i + 1}%02d 10:00:00", "view",
          1.0)
      }
    }
    val d = ev(rows: _*)
    val acf = Anomaly.dailyAcf(d, maxLag = 4)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    val p = Anomaly.pacfReport(d, maxLag = 4)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(math.abs(p(1) - acf(1)) < 1e-9)
    val expected = (acf(2) - acf(1) * acf(1)) / (1.0 - acf(1) * acf(1))
    assert(math.abs(p(2) - expected) < 1e-5)
  }

  test("link prediction: persistent pair outranks the one-off") {
    def o(id: Long, date: String) = (id, java.sql.Date.valueOf(date))
    val orders = Seq(
      o(1, "2024-06-01"), o(2, "2024-06-03"), o(3, "2024-06-05"),
      o(4, "2024-06-20"), o(5, "2024-06-25"))
      .toDF("o_orderkey", "o_orderdate")
    val li = Seq(
      (1L, 101L), (1L, 102L),          // H1: (101,102)
      (2L, 101L), (2L, 102L),          // H1: (101,102) again → score 2/ln2
      (3L, 103L), (3L, 104L),          // H1: (103,104) → score 1/ln2
      (4L, 101L), (4L, 102L),          // H2: (101,102) repeats → pos
      (5L, 103L), (5L, 105L))          // H2: (103,104) does not
      .toDF("l_orderkey", "l_partkey")
    val r = Basket.linkPredictionEval(li, orders).collect().head
    assert(r.getLong(0) == 1L && r.getLong(1) == 1L)
    assert(r.getDouble(3) == 1.0, "higher-scored pair is the one that persists")
  }

  private def daysDf(ys: Seq[Double]) =
    ys.zipWithIndex.map { case (v, i) =>
      val d = java.time.LocalDate.of(2024, 3, 1).plusDays(i)
      (1L, java.sql.Timestamp.valueOf(d.atTime(12, 0)), "view", v)
    }.toDF("user_id", "ts", "event_type", "value")

  test("theta: SES-plus-half-slope replays the recursions by hand") {
    // trending series with pseudo-noise: the drift term must help
    val ys = (1 to 20).map(t => 2.0 * t + (t * 7 % 5)).toSeq
    val r = Forecast.theta(daysDf(ys)).collect().head
    // brute SES recursion (α = 0.3)
    val lvl = ys.tail.scanLeft(ys.head)((s, y) => 0.3 * y + 0.7 * s)
    val n = ys.length
    val ts = (1 to n).map(_.toDouble)
    val slope = (n * ts.zip(ys).map { case (a, b) => a * b }.sum -
      ts.sum * ys.sum) / (n * ts.map(t => t * t).sum - ts.sum * ts.sum)
    val maeSes = ys.tail.zip(lvl).map { case (y, f) =>
      math.abs(y - f) }.sum / (n - 1)
    val maeTheta = ys.tail.zip(lvl).map { case (y, f) =>
      math.abs(y - f - slope / 2) }.sum / (n - 1)
    assert(r.getLong(0) == n.toLong)
    assert(math.abs(r.getDouble(1) - slope) < 1e-6)
    assert(math.abs(r.getDouble(2) - lvl.last) < 1e-6)
    assert(math.abs(r.getDouble(4) - (lvl.last + slope / 2)) < 1e-6)
    assert(math.abs(r.getDouble(5) - maeSes) < 1e-6)
    assert(math.abs(r.getDouble(6) - maeTheta) < 1e-6)
    assert(maeTheta < maeSes, "drift term must beat plain SES here")
  }

  test("damped holt replays the phi recursion by hand") {
    // dampedHolt smooths daily event COUNTS — plant k_t events/day
    val ys = Seq(3.0, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8)
    val df = ys.zipWithIndex.flatMap { case (k, i) =>
      (1 to k.toInt).map(j => (j.toLong, java.sql.Timestamp.valueOf(
        f"2024-03-${i + 1}%02d 12:00:00"), "view", 1.0))
    }.toDF("user_id", "ts", "event_type", "value")
    val (a, b, phi) = (0.3, 0.1, 0.9)
    var l = ys.head; var tr = 0.0; var sae = 0.0
    ys.tail.foreach { y =>
      val f = l + phi * tr
      sae += math.abs(y - f)
      val l2 = a * y + (1 - a) * f
      tr = b * (l2 - l) + (1 - b) * phi * tr
      l = l2
    }
    val r = Forecast.dampedHolt(df).collect().head
    assert(r.getString(0) == "view" && r.getLong(1) == 12L)
    assert(math.abs(r.getDouble(2) - l) < 1e-6)
    assert(math.abs(r.getDouble(3) - tr) < 1e-6)
    assert(math.abs(r.getDouble(4) - (l + phi * tr)) < 1e-6)
    assert(math.abs(r.getDouble(5) - (l + tr * (phi / (1 - phi))))
      < 1e-6)
    assert(math.abs(r.getDouble(6) - sae / 11) < 1e-6)
  }

  test("diebold-mariano replays the loss-differential arithmetic") {
    // periodic pattern + drift: snaive error is a constant 3.5,
    // SES lags the cycle — d_t = |e_ses| − 3.5 varies
    val ys = (1 to 21).map(t => (t % 7) * 10.0 + t * 0.5).toSeq
    val r = Forecast.dieboldMariano(daysDf(ys)).collect().head
    val lvl = ys.tail.scanLeft(ys.head)((s, y) => 0.3 * y + 0.7 * s)
    val win = (8 to 21).map { t =>
      val y = ys(t - 1)
      (math.abs(y - lvl(t - 2)), math.abs(y - ys(t - 8)))
    }
    val n = win.size.toDouble
    val ds = win.map { case (a, b) => a - b }
    val dbar = ds.sum / n
    val g0 = ds.map(d => (d - dbar) * (d - dbar)).sum / n
    val dm = dbar / math.sqrt(g0 / n)
    assert(r.getLong(0) == 14L)
    assert(math.abs(r.getDouble(1) - win.map(_._1).sum / n) < 1e-6)
    assert(math.abs(r.getDouble(2) - win.map(_._2).sum / n) < 1e-6)
    assert(math.abs(r.getDouble(3) - dbar) < 1e-6)
    assert(math.abs(r.getDouble(4) - dm) < 1e-6)
    assert(math.abs(r.getDouble(5) - dm * math.sqrt((n - 1) / n))
      < 1e-6)
  }

  test("tracking signal: persistent bias saturates, brute agrees") {
    def brute(ys: Seq[Double]): (Double, Double, Double, Long) = {
      var s = ys.head
      var e = Option.empty[Double]; var m = Option.empty[Double]
      var al = 0L
      ys.tail.foreach { y =>
        val err = y - s
        val e2 = e.fold(0.1 * err)(p => 0.1 * err + 0.9 * p)
        val m2 = m.fold(math.abs(err))(p =>
          0.1 * math.abs(err) + 0.9 * p)
        if (math.abs(e2) > 0.51 * m2) al += 1
        e = Some(e2); m = Some(m2)
        s = 0.3 * y + 0.7 * s
      }
      (e.get, m.get, e.get / m.get, al)
    }
    // steadily rising series: SES lags below, every error positive —
    // TS climbs toward 1 and alarms fire once E outruns 0.51·M
    val rising = (1 to 15).map(t => t * 10.0).toSeq
    val r = Forecast.trackingSignal(daysDf(rising)).collect().head
    val (e, m, ts, al) = brute(rising)
    assert(r.getLong(0) == 15L && r.getLong(1) == 14L)
    assert(math.abs(r.getDouble(2) - e) < 1e-6)
    assert(math.abs(r.getDouble(3) - m) < 1e-6)
    assert(math.abs(r.getDouble(4) - ts) < 1e-6)
    assert(r.getLong(5) == al)
    assert(ts > 0.9 && al > 5L, s"bias must saturate: ts=$ts al=$al")
    // alternating series: errors flip sign, E stays near 0
    val alt = Seq.fill(8)(Seq(10.0, 20)).flatten
    val r2 = Forecast.trackingSignal(daysDf(alt)).collect().head
    val (_, _, ts2, al2) = brute(alt)
    assert(math.abs(r2.getDouble(4) - ts2) < 1e-6)
    assert(r2.getLong(5) == al2)
    assert(math.abs(ts2) < 0.5, s"no persistent bias: ts=$ts2")
  }

  test("holt-winters replays the 3-state recursion and learns the week") {
    // 6 weeks of trend + strong weekly shape
    val pat = Seq(0.0, 10, 20, 30, 40, 50, 60)
    val ys = (1 to 42).map(t => 100.0 + t + pat((t - 1) % 7)).toSeq
    val df = daysDf(ys)
    // brute replay with dow slots keyed the same way (March 1 2024
    // is a Friday → Spark dayofweek = 6)
    val (a, be, g) = (0.3, 0.1, 0.2)
    val dows = (1 to 42).map(t =>
      java.time.LocalDate.of(2024, 3, 1).plusDays(t - 1)
        .getDayOfWeek.getValue % 7 + 1)   // Sunday = 1, like Spark
    var l = ys.head; var b = 0.0; var sae = 0.0
    val s = Array.fill(8)(0.0)   // 1-based slots
    (2 to 42).foreach { t =>
      val y = ys(t - 1); val dw = dows(t - 1)
      if (t >= 8) sae += math.abs(y - (l + b + s(dw)))
      val l2 = a * (y - s(dw)) + (1 - a) * (l + b)
      b = be * (l2 - l) + (1 - be) * b
      s(dw) = g * (y - l2) + (1 - g) * s(dw)
      l = l2
    }
    val dwn = dows.head match { case _ =>
      java.time.LocalDate.of(2024, 3, 1).plusDays(42)
        .getDayOfWeek.getValue % 7 + 1 }
    val r = Forecast.holtWinters(df).collect().head
    assert(r.getLong(0) == 42L && r.getLong(1) == 35L)
    assert(math.abs(r.getDouble(2) - l) < 1e-6)
    assert(math.abs(r.getDouble(3) - b) < 1e-6)
    assert(math.abs(r.getDouble(4) - s(dwn)) < 1e-6)
    assert(math.abs(r.getDouble(5) - (s.drop(1).max - s.drop(1).min))
      < 1e-6)
    assert(math.abs(r.getDouble(6) - (l + b + s(dwn))) < 1e-6)
    assert(math.abs(r.getDouble(7) - sae / 35) < 1e-6)
    // after 6 weeks the learned amplitude must approach the true 60
    assert(r.getDouble(5) > 30.0,
      s"weekly shape must be learned: spread=${r.getDouble(5)}")
  }

  test("croston: hand-traced intermittent state machine") {
    // spine days 1..7 pinned by cheap orders; demands (urgent,
    // > 450k) on day 2 (×2) and day 5 (×1). α = 0.1:
    //   d2 first demand: z = 2, p = 2 (its own day index)
    //   d5: z = .1·1 + .9·2 = 1.9; p = .1·3 + .9·2 = 2.1
    def o(d: Int, pri: String, price: Double) =
      (java.sql.Timestamp.valueOf(f"2024-03-$d%02d 00:00:00"), pri,
        price)
    val orders = Seq(
      o(1, "5-LOW", 100.0), o(7, "5-LOW", 100.0),
      o(2, "1-URGENT", 500000.0), o(2, "1-URGENT", 460000.0),
      o(5, "1-URGENT", 470000.0),
      o(3, "1-URGENT", 100.0)   // urgent but small: not a demand
    ).toDF("o_orderdate", "o_orderpriority", "o_totalprice")
    val r = Forecast.croston(orders).collect().head
    assert(r.getLong(0) == 7L && r.getLong(1) == 2L)
    assert(math.abs(r.getDouble(2) - 5.0 / 7) < 1e-6)
    assert(math.abs(r.getDouble(3) - 1.9) < 1e-9)
    assert(math.abs(r.getDouble(4) - 2.1) < 1e-9)
    assert(math.abs(r.getDouble(5) - 1.9 / 2.1) < 1e-6)
    assert(math.abs(r.getDouble(6) - 1.9 / 2.1 * 0.95) < 1e-6)
  }
}
