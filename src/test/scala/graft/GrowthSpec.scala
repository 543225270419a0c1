package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Forecast, Growth}

/** Growth accounting identities, SES recursion equivalence, and the
  * retention-decay fit on a planted exponential. */
class GrowthSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(id: Long, user: Long, day: Int) =
    (id, java.sql.Timestamp.valueOf(f"2024-04-$day%02d 12:00:00"),
      user, "view", 1.0, "{}")

  private def frame(rows: Seq[(Long, java.sql.Timestamp, Long, String,
      Double, String)]) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("growth accounting: hand scenario with all four doors") {
    // day1: u1, u2 (both new). day2: u1 (retained), u3 (new);
    // u2 churns into day2. day3: u2 (resurrected), u1 churns? no —
    // day3: u2, u3 → u3 retained, u2 resurrected, u1 churns into day3
    val e = frame(Seq(
      ev(1, 1, 1), ev(2, 2, 1),
      ev(3, 1, 2), ev(4, 3, 2),
      ev(5, 2, 3), ev(6, 3, 3)))
    val got = Growth.accounting(e)
      .select("d", "dau", "new_users", "retained", "resurrected",
        "churned", "net")
      .collect().map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    assert(got("2024-04-01") == ((2L, 2L, 0L, 0L, 0L, 2L)))
    assert(got("2024-04-02") == ((2L, 1L, 1L, 0L, 1L, 0L)))
    assert(got("2024-04-03") == ((2L, 0L, 1L, 1L, 1L, 0L)))
  }

  test("growth accounting identities hold on denser data") {
    val e = frame((1 to 200).map(i =>
      ev(i.toLong, (i % 17).toLong, i % 9 + 1)))
    val rows = Growth.accounting(e)
      .select("d", "dau", "new_users", "retained", "resurrected", "net")
      .collect().sortBy(_.getDate(0).toString)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3) + r.getLong(4),
        s"dau must equal new+retained+resurrected: $r")
    }
    // net telescopes to the DAU delta between consecutive days
    rows.sliding(2).foreach { p =>
      if (p.length == 2 &&
        p(1).getDate(0).toLocalDate.minusDays(1) ==
          p(0).getDate(0).toLocalDate)
        assert(p(1).getLong(5) == p(1).getLong(1) - p(0).getLong(1))
    }
  }

  test("growth accounting: net telescopes across a fully-inactive day") {
    // day1: u1, u2. day2: NOBODY. day3: u1 returns.
    // The spine row for day2 must carry churned=2, net=-2; day3 then
    // sees prev_dau=0 and books u1 as resurrected — net sums to the
    // total DAU delta over ANY span, gap or not.
    val e = frame(Seq(ev(1, 1, 1), ev(2, 2, 1), ev(3, 1, 3)))
    val rows = Growth.accounting(e)
      .select("d", "dau", "new_users", "retained", "resurrected",
        "churned", "net")
      .collect().sortBy(_.getDate(0).toString)
    assert(rows.length == 3, "spine must include the silent day")
    val byDay = rows.map(r => r.getDate(0).toString -> r).toMap
    val gap = byDay("2024-04-02")
    assert(gap.getLong(1) == 0L && gap.getLong(5) == 2L &&
      gap.getLong(6) == -2L, s"gap day: $gap")
    val back = byDay("2024-04-03")
    assert(back.getLong(4) == 1L && back.getLong(6) == 1L,
      s"return day: $back")
    rows.sliding(2).foreach { p =>
      assert(p(1).getLong(6) == p(1).getLong(1) - p(0).getLong(1),
        "net = DAU delta must hold on EVERY consecutive spine pair")
    }
  }

  test("ses: closed-form window equals the textbook recursion") {
    val counts = Seq(4, 7, 2, 9, 5, 6)
    val e = frame(counts.zipWithIndex.flatMap { case (n, d) =>
      (1 to n).map(i => ev(d * 100L + i, i.toLong, d + 1))
    })
    val alpha = 0.3
    val got = Forecast.sesBacktest(e, alpha)
      .select("y", "level", "forecast").collect()
    var s = counts.head.toDouble
    counts.zipWithIndex.foreach { case (y, i) =>
      if (i > 0) {
        val fc = got(i).getDouble(2)
        assert(fc == BigDecimal(s).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble,
          s"forecast for step $i must be the previous level")
        s = alpha * y + (1 - alpha) * s
      }
      assert(got(i).getDouble(1) == BigDecimal(s).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble,
        s"level at step $i: got ${got(i).getDouble(1)}, want $s")
    }
    assert(got.head.isNullAt(2), "first day has no one-step forecast")
  }

  test("ltv curve: hand case with truncation-aware denominators") {
    // u1 starts day1 (window 3): buys 10 at k=0, 5 at k=2
    // u2 starts day3 (window 1): buys 20 at k=0
    // u3 starts day4 (window 0): buys 2 at k=0  [max date = day4]
    def buy(id: Long, user: Long, day: Int, v: Double) =
      (id, java.sql.Timestamp.valueOf(f"2024-04-$day%02d 12:00:00"),
        user, "purchase", v, "{}")
    val e = frame(Seq(
      buy(1, 1, 1, 10.0), buy(2, 1, 3, 5.0),
      buy(3, 2, 3, 20.0), buy(4, 3, 4, 2.0)))
    val got = graft.operators.Growth.ltvCurve(e)
      .select("k", "n_users", "avg_ltv")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // k=0: all 3 covered → (10+20+2)/3; k=1: u1,u2 → (10+20)/2
    // k=2: u1 only → 15; k=3: u1 only → 15
    assert(got(0L) == ((3L, BigDecimal(32.0 / 3).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(got(1L) == ((2L, 15.0)))
    assert(got(2L) == ((1L, 15.0)))
    assert(got(3L) == ((1L, 15.0)))
  }

  test("retention decay: planted exponential recovers rate and half-life") {
    // users all start day 1 with a 30-day window; activity at offset
    // k for exactly round(64·2^(−k/2)) users → r_k = 2^(−k/2),
    // b = −ln2/2, half-life = 2
    val users = 64
    val rows = (1L to users.toLong).map(u => ev(u, u, 1)) ++
      (1 to 8).flatMap { k =>
        val active = math.round(users * math.pow(2.0, -k / 2.0)).toInt
        (1 to active).map(u =>
          ev(1000L * k + u, u.toLong, k + 1))
      }
    val r = Growth.retentionDecay(frame(rows))
      .select("n_points", "decay_rate", "half_life_days")
      .collect().head
    assert(r.getLong(0) == 8L)
    val b = r.getDouble(1)
    // rounding of user counts makes the fit approximate — ±3%
    assert(math.abs(b - (-math.log(2.0) / 2.0)) < 0.01,
      s"decay rate should be about −ln2/2: $b")
    assert(math.abs(r.getDouble(2) - 2.0) < 0.06,
      s"half-life about 2 days: ${r.getDouble(2)}")
  }
}
