package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Anomaly, Benford}
import graft.quality.Dependencies

/** Specs for the profiling trio: FD discovery, Benford first-digit
  * audit, daily-count autocorrelation. */
class ProfilingOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- FD discovery ----

  test("fd: a key determines everything; non-keys hold only where data says") {
    val df = Seq(
      (1L, "a", 10), (2L, "a", 10), (3L, "b", 20), (4L, "b", 21))
      .toDF("id", "grp", "v")
    val got = Dependencies.fdReport(df, Seq("id", "grp", "v"))
      .select("lhs", "rhs", "violations", "holds")
      .as[(String, String, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got(("id", "grp")) == ((0L, true)))   // id is a key
    assert(got(("id", "v")) == ((0L, true)))
    assert(got(("grp", "v")) == ((1L, false)))   // b → {20, 21}
    assert(got(("v", "grp")) == ((0L, true)))    // each v has one grp
    assert(got(("grp", "id")) == ((2L, false)))
  }

  test("g3: violation rate is the minimal row-removal fraction") {
    // grp 'a' -> v is clean; grp 'b' maps to {20, 20, 21}: removing
    // the single 21 row fixes it -> g3 = 1/5
    val df = Seq(
      (1L, "a", 10), (2L, "a", 10), (3L, "b", 20), (4L, "b", 20),
      (5L, "b", 21))
      .toDF("id", "grp", "v")
    val got = Dependencies.g3Report(df,
      Seq(("grp", "v"), ("id", "v"), ("v", "grp")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val gv = got(("grp", "v"))
    assert(gv.getLong(3) == 1L && gv.getDouble(4) == 0.2)
    assert(!gv.getBoolean(5))
    assert(got(("id", "v")).getDouble(4) == 0.0, "key: g3 = 0")
    assert(got(("id", "v")).getBoolean(5))
    assert(got(("v", "grp")).getDouble(4) == 0.0)
  }

  test("fd: null field in rhs doesn't drop the pair row") {
    val df = Seq((1L, Some("x")), (2L, None), (3L, None))
      .toDF("id", "s")
    val got = Dependencies.fdReport(df, Seq("id", "s"))
      .where(col("lhs") === "id").select("n_pairs", "holds")
      .as[(Long, Boolean)].collect().head
    // (1,x) (2,null) (3,null) — three distinct pairs, id still a key
    assert(got == ((3L, true)))
  }

  // ---- Benford ----

  test("benford: a log-uniform feed conforms; digits and rows complete") {
    // 10^u for u uniform in [0,3): textbook Benford-conforming
    val rnd = new scala.util.Random(5)
    val vals = (1 to 20000).map(_ => math.pow(10.0, rnd.nextDouble() * 3))
    val got = Benford.firstDigitReport(vals.toDF("v"), "v")
      .select("digit", "obs_p", "exp_p", "chi2_term", "mad")
      .as[(Int, Double, Double, Double, Double)].collect()
    assert(got.map(_._1).toSeq == (1 to 9))
    assert(got.head._5 < 0.01)   // Nigrini close-conformity range
    got.foreach { r => assert(math.abs(r._2 - r._3) < 0.02) }
  }

  test("benford: a uniform feed is flagged; missing digits still owe chi2") {
    // all values share first digit 7 → digits 1-6,8,9 absent but present
    // in the report with obs_p 0 and a positive expected-share penalty
    val got = Benford.firstDigitReport(
      Seq(700.0, 71.0, 7.3, 750.0).toDF("v"), "v")
      .select("digit", "n", "obs_p", "chi2_term")
      .as[(Int, Long, Double, Double)].collect()
    assert(got.length == 9)
    val seven = got.find(_._1 == 7).get
    assert(seven._2 == 4L && seven._3 == 1.0)
    got.filter(_._1 != 7).foreach { r =>
      assert(r._2 == 0L && r._3 == 0.0 && r._4 > 0.0)
    }
  }

  test("benford: zero, negative and null rows are excluded") {
    val got = Benford.firstDigitReport(
      Seq[Option[Double]](Some(12.0), Some(0.0), Some(-5.0), None)
        .toDF("v"), "v")
      .agg(sum("n")).as[Long].collect().head
    assert(got == 1L)
  }

  // ---- Hampel ----

  test("hampel: robust to the outlier that drags a mean/σ baseline") {
    // 13 quiet days at 10±1 and one 100-count spike: the median/MAD
    // baseline flags the spike and nothing else
    val rows = (0 until 14).flatMap { d =>
      val n = if (d == 9) 100 else 10 + (d % 3) - 1
      (1 to n).map(i => (d.toLong * 1000 + i,
        java.sql.Timestamp.valueOf(f"2024-03-${d + 1}%02d 09:00:00"), "a"))
    }
    val got = Anomaly.hampelReport(
      rows.toDF("event_id", "ts", "event_type"))
      .select("d", "c", "outlier")
      .as[(java.sql.Date, Double, Boolean)].collect()
    assert(got.count(_._3) == 1)
    assert(got.find(_._3).get._2 == 100.0)
  }

  test("hampel: zero MAD degenerates to any-deviation flagging, z null") {
    // constant series + one deviant day → MAD 0
    val rows = (0 until 8).flatMap { d =>
      val n = if (d == 3) 7 else 5
      (1 to n).map(i => (d.toLong * 100 + i,
        java.sql.Timestamp.valueOf(f"2024-04-0${d + 1} 09:00:00"), "x"))
    }
    val got = Anomaly.hampelReport(
      rows.toDF("event_id", "ts", "event_type"))
      .select("c", "mad", "outlier").collect()
    assert(got.forall(_.getDouble(1) == 0.0))
    assert(got.forall(r => r.isNullAt(2) == false))
    assert(got.count(_.getBoolean(2)) == 1)
  }

  // ---- mutual information ----

  test("mi: independent columns score 0; deterministic mapping scores H(X)") {
    // independent: every (a, b) cell equally likely
    val ind = (for (a <- Seq("x", "y"); b <- Seq(1, 2); _ <- 1 to 5)
      yield (a, b)).toDF("a", "b")
    val mi0 = Dependencies.mutualInformation(ind, "a", "b")
      .select("mi_bits").as[Double].collect().head
    assert(mi0 == 0.0)
    // deterministic 1:1 over a uniform 4-category X → MI = H(X) = 2 bits
    val det = (for (i <- 0 until 4; _ <- 1 to 3)
      yield (s"c$i", i)).toDF("a", "b")
    val mi2 = Dependencies.mutualInformation(det, "a", "b")
      .select("mi_bits").as[Double].collect().head
    assert(mi2 == 2.0)
  }

  test("mi: hand-computed asymmetric 2x2 case") {
    // joint counts: (x,1)=3 (x,2)=1 (y,1)=1 (y,2)=3, N=8
    val df = (Seq.fill(3)(("x", 1)) ++ Seq(("x", 2)) ++
      Seq(("y", 1)) ++ Seq.fill(3)(("y", 2))).toDF("a", "b")
    val cells = Seq((3.0, 0.5, 0.5), (1.0, 0.5, 0.5),
      (1.0, 0.5, 0.5), (3.0, 0.5, 0.5))
    val expect = cells.map { case (n, pa, pb) =>
      val pxy = n / 8.0
      pxy * math.log(pxy / (pa * pb)) / math.log(2.0)
    }.sum
    val got = Dependencies.mutualInformation(df, "a", "b")
      .select("mi_bits").as[Double].collect().head
    assert(got == BigDecimal(expect)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("mi: per-cell marginals are the true marginals, not the grand total") {
    // the Spark 4.1 stacked-window corruption makes every partition
    // spec return the grand total (p_a = p_b = 1.0 for all cells);
    // the joined-stat-tables form must show the real skewed marginals
    val df = (Seq(("x", 1), ("x", 2)) ++ Seq.fill(2)(("y", 1)))
      .toDF("a", "b")
    val cells = Dependencies.mutualInformation(df, "a", "b")
      .select("a", "b", "p_a", "p_b")
      .as[(String, Int, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(cells(("x", 1)) == ((0.5, 0.75)))
    assert(cells(("x", 2)) == ((0.5, 0.25)))
    assert(cells(("y", 1)) == ((0.5, 0.75)))
  }

  // ---- CUSUM ----

  private def dayEvents(counts: Seq[Int], key: String = "a") =
    counts.zipWithIndex.flatMap { case (n, d) =>
      (1 to n).map(i => (d.toLong * 1000 + i,
        java.sql.Timestamp.valueOf(f"2024-05-${d + 1}%02d 12:00:00"), key))
    }.toDF("event_id", "ts", "event_type")

  test("cusum: reflected-walk closed form equals the sequential recurrence") {
    // arbitrary wiggly series; verify against a direct Scala loop
    val counts = Seq(10, 12, 9, 11, 10, 8, 12, 10, 9, 11, 14, 16, 18, 20)
    val got = Anomaly.cusumReport(dayEvents(counts),
      baselineDays = 10, k = 0.5, h = 4.0)
      .select("cusum").as[Double].collect().toSeq
    val base = counts.take(10).map(_.toDouble)
    val mu = base.sum / base.size
    val sd = math.sqrt(base.map(x => x * x).sum / base.size - mu * mu)
    var st = 0.0
    val expect = counts.map { x =>
      st = math.max(0.0, st + (x - mu - 0.5 * sd))
      BigDecimal(st).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got == expect)
  }

  test("cusum: a level shift alarms after the shift, never before") {
    val counts = Seq.fill(10)(10) ++ Seq.fill(6)(10) ++ Seq.fill(8)(30)
    val got = Anomaly.cusumReport(dayEvents(counts),
      baselineDays = 10)
      .select("d", "alarm").as[(java.sql.Date, Boolean)].collect()
    val firstAlarm = got.indexWhere(_._2)
    assert(firstAlarm >= 16, s"alarm before the shift at $firstAlarm")
    assert(got.drop(firstAlarm).forall(_._2), "alarm must latch while high")
  }

  // ---- cross-correlation ----

  test("ccf: a series against itself peaks at lag 0 with r = 1") {
    val rows = (0 until 12).flatMap { d =>
      (1 to (d % 5) + 2).map(i => (d.toLong * 100 + i,
        java.sql.Timestamp.valueOf(f"2024-06-${d + 1}%02d 12:00:00"), "a"))
    }
    val got = Anomaly.crossCorrelation(
      rows.toDF("event_id", "ts", "event_type"), "a", "a", maxLag = 2)
      .select("lag", "ccf").as[(Int, Double)].collect().toMap
    assert(got(0) == 1.0)
    assert(got(1) < 1.0 && got(-1) < 1.0)
    assert(got(1) == got(-1))   // self-CCF is symmetric
  }

  test("ccf: a planted k-day lead peaks at that lag") {
    // b's series is a's shifted forward by 2 days
    val aCounts = Seq(5, 9, 3, 12, 6, 10, 4, 11, 7, 8, 5, 13)
    val rows = aCounts.zipWithIndex.flatMap { case (n, d) =>
      (1 to n).map(i => (d.toLong * 1000 + i,
        java.sql.Timestamp.valueOf(f"2024-07-${d + 1}%02d 12:00:00"), "a")) ++
        (1 to n).map(i => (d.toLong * 1000 + 500 + i,
          java.sql.Timestamp.valueOf(f"2024-07-${d + 3}%02d 12:00:00"), "b"))
    }
    val got = Anomaly.crossCorrelation(
      rows.toDF("event_id", "ts", "event_type"), "a", "b", maxLag = 3)
      .select("lag", "ccf").as[(Int, Double)].collect().toMap
    assert(got(2) > 0.9, s"planted 2-day lead must peak: $got")
    assert(got.filter(_._1 != 2).values.forall(_ < got(2)))
  }

  // ---- robust location / Theil–Sen ----

  test("robust location: one outlier drags the mean, not the robust forms") {
    val vals = Seq.fill(18)(10.0) ++ Seq(12.0, 1000.0)
    val ev = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, java.sql.Timestamp.valueOf("2024-09-01 10:00:00"),
        "a", v) }.toDF("event_id", "ts", "event_type", "value")
    val r = Anomaly.robustLocation(ev, "event_type", "value")
      .select("mean", "trimmed_mean", "winsorized_mean")
      .as[(Double, Double, Double)].collect().head
    assert(r._1 > 55.0)                       // dragged
    assert(r._2 >= 10.0 && r._2 <= 10.2)      // tails trimmed
    assert(r._3 >= 10.0 && r._3 < 25.0)       // tails clamped
  }

  test("theil-sen: robust to a corrupted day the OLS slope absorbs") {
    // clean trend +2/day over 15 days; the spike sits at the END where
    // its OLS leverage is maximal (a centered spike cancels out)
    val rows = (0 until 15).flatMap { d =>
      val n = 10 + 2 * d + (if (d == 14) 500 else 0)
      (1 to n).map(i => (d.toLong * 10000 + i,
        java.sql.Timestamp.valueOf(f"2024-09-${d + 1}%02d 12:00:00")))
    }
    val r = Anomaly.theilSen(rows.toDF("event_id", "ts"))
      .select("theil_sen_slope", "ols_slope")
      .as[(Double, Double)].collect().head
    assert(r._1 == 2.0, s"robust slope must recover the trend: $r")
    assert(math.abs(r._2 - 2.0) > 1.0, s"OLS must be visibly dragged: $r")
  }

  // ---- seasonal decomposition ----

  test("seasonal decompose: planted weekday effect lands in seasonal, residual small") {
    // 28 days: flat level 20, Sundays (day 0, 7, ...) spike +14
    val rows = (0 until 28).flatMap { d =>
      val n = 20 + (if (d % 7 == 0) 14 else 0)
      (1 to n).map(i => (d.toLong * 1000 + i,
        java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00")))
    }
    val got = Anomaly.seasonalDecompose(rows.toDF("event_id", "ts"))
      .select("weekday", "seasonal", "residual")
      .as[(Int, Double, Double)].collect()
    // 2024-01-01 is a Monday, so the d%7==0 spikes are Mondays
    // (Spark dayofweek: Sunday=1, Monday=2)
    val sundays = got.filter(_._1 == 2).map(_._2)
    val others = got.filterNot(_._1 == 2).map(_._2)
    assert(sundays.forall(s => s > 8.0), s"spike must land in seasonal")
    assert(others.forall(s => s < 1.0))
    // interior residuals (full trend windows) are near zero
    assert(got.map(r => math.abs(r._3)).sorted.apply(got.length / 2) < 3.0)
    // identity holds exactly: c = trend + seasonal + residual
    val full = Anomaly.seasonalDecompose(rows.toDF("event_id", "ts"))
      .select("c", "trend", "seasonal", "residual")
      .as[(Double, Double, Double, Double)].collect()
    full.foreach { r =>
      assert(math.abs(r._1 - (r._2 + r._3 + r._4)) < 0.001)
    }
  }

  // ---- entropy rate ----

  test("entropy rate: deterministic loop is 0; uniform chain is log2(k)") {
    def ev(seq: Seq[String], uid: Long) = seq.zipWithIndex.map {
      case (t, i) => (uid * 1000 + i, uid,
        java.sql.Timestamp.valueOf(f"2024-08-01 ${10 + i / 60}%02d:${i % 60}%02d:00"), t)
    }
    // user 1 cycles a→b→a→b…: every conditional is certain → rate 0
    val loop = ev(Seq.fill(20)(Seq("a", "b")).flatten, 1L)
      .toDF("event_id", "user_id", "ts", "event_type")
    val r0 = graft.operators.Sessionize.entropyRate(loop)
      .select("entropy_rate_bits").as[Double].collect().head
    assert(r0 == 0.0)
    // exactly uniform transitions: four users contributing one
    // transition each — a→a, a→b, b→a, b→b → 1 bit/step
    val uni = Seq(("a", "a"), ("a", "b"), ("b", "a"), ("b", "b"))
      .zipWithIndex.flatMap { case ((x, y), u) =>
        Seq((u * 10L, u.toLong + 10L,
          java.sql.Timestamp.valueOf("2024-08-02 10:00:00"), x),
          (u * 10L + 1L, u.toLong + 10L,
            java.sql.Timestamp.valueOf("2024-08-02 10:01:00"), y))
      }.toDF("event_id", "user_id", "ts", "event_type")
    val r1 = graft.operators.Sessionize.entropyRate(uni)
      .select("entropy_rate_bits").as[Double].collect().head
    assert(r1 == 1.0, s"uniform 2-state chain must be 1 bit: $r1")
  }

  // ---- daily ACF ----

  test("acf: a perfectly periodic series spikes at its period") {
    // 28 days of period-7 counts: c = 100 on day%7==0 else 10
    val rows = (0 until 28).flatMap { d =>
      val n = if (d % 7 == 0) 100 else 10
      (1 to n).map(i => (d.toLong * 1000 + i,
        java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00")))
    }
    val ev = rows.toDF("event_id", "ts")
    val got = Anomaly.dailyAcf(ev, maxLag = 7)
      .select("lag", "acf").as[(Int, Double)].collect().toMap
    // exactly periodic ⇒ x_t·x_{t+7} = x_t², so r7 = (28−7)/28 = 0.75
    // (the constant full-series denominator scales by pair coverage)
    assert(got(7) == 0.75)
    assert(got(1) < got(7))         // off-period lags anticorrelate
  }

  test("acf: hand-computed two-lag case") {
    // daily counts 1,2,3,4 → x = -1.5,-0.5,0.5,1.5; den = 5
    // r1 = (0.75 - 0.25 + 0.75)/5 = 0.25; r2 = (-0.75 - 0.75)/5 = -0.3
    val rows = (0 until 4).flatMap { d =>
      (1 to d + 1).map(i => (d.toLong * 10 + i,
        java.sql.Timestamp.valueOf(f"2024-02-0${d + 1} 08:00:00")))
    }
    val got = Anomaly.dailyAcf(rows.toDF("event_id", "ts"), maxLag = 2)
      .select("lag", "n_pairs", "acf").as[(Int, Long, Double)].collect()
    assert(got.toSeq == Seq((1, 3L, 0.25), (2, 2L, -0.3)))
  }
}
