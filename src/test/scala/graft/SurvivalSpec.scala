package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Experiment, Survival}

/** Hand-computed Kaplan–Meier and Welch t-test cases. */
class SurvivalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def user(id: Long, firstDay: Int, lastDay: Int) = Seq(
    (id * 100, java.sql.Timestamp.valueOf(
      f"2024-06-$firstDay%02d 09:00:00"), id, "view", 1.0, "{}"),
    (id * 100 + 1, java.sql.Timestamp.valueOf(
      f"2024-06-$lastDay%02d 09:00:00"), id, "view", 1.0, "{}"))

  private def events(rows: Seq[(Long, java.sql.Timestamp, Long, String,
      Double, String)]) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("aalen-johansen: hand-computed two-cause incidence") {
    def ev(id: Long, eid: Long, day: Int, tpe: String) =
      (eid, java.sql.Timestamp.valueOf(f"2024-06-$day%02d 09:00:00"),
        id, tpe, 1.0, "{}")
    // u1 purchases day+1, u2 errors day+1, u3 purchases day+2,
    // u4 never resolves (censors at its last day, day+3)
    val rows = Seq(
      ev(1, 1, 1, "view"), ev(1, 2, 2, "purchase"),
      ev(2, 3, 1, "view"), ev(2, 4, 2, "error"),
      ev(3, 5, 1, "view"), ev(3, 6, 3, "purchase"),
      ev(4, 7, 1, "view"), ev(4, 8, 4, "view"))
    val r = Survival.competingRisks(events(rows)).collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    val t1 = r(0); val t2 = r(1)
    // t=1: n=4, one purchase + one error: CIFs 0.25 / 0.25
    assert(t1.getLong(1) == 4L)
    assert(t1.getDouble(4) == 0.25 && t1.getDouble(5) == 0.25)
    // t=2: S(1) = 0.5, n_risk=2, one purchase:
    // CIF_p = 0.25 + 0.5 * 1/2 = 0.5; CIF_e unchanged
    assert(t2.getLong(1) == 2L)
    assert(t2.getDouble(4) == 0.5 && t2.getDouble(5) == 0.25)
  }

  test("rdd: a planted sharp jump is recovered exactly") {
    import graft.operators.Regression
    // y = 2 + 0.001x left of 0, y = 5 + 0.001x right: jump = 3.
    // Encode y as order count per customer.
    val xs = (-20 to 20).filter(_ != 0).map(_ * 50.0)   // +-1000
    val cust = xs.zipWithIndex.map { case (x, i) =>
      (i.toLong, x) }.toDF("c_custkey", "c_acctbal")
    val orders = xs.zipWithIndex.flatMap { case (x, i) =>
      val y = (if (x >= 0) 5 else 2) + (x / 1000.0).round.toInt.abs
      (0 until y).map(j => (i.toLong * 1000 + j, i.toLong))
    }.toDF("o_orderkey", "o_custkey")
    val r = Regression.rddJump(cust, orders, cutoff = 0.0,
      bandwidth = 2000.0).collect()(0)
    assert(r.getLong(0) == 20L && r.getLong(1) == 20L)
    // slopes recovered (|x|/1000 rounded makes a symmetric staircase
    // around each side's mean; intercepts at 0 still differ by ~3)
    val jump = r.getDouble(6)
    assert(jump > 2.0 && jump < 4.0, s"jump=$jump")
  }

  test("km: textbook curve with censoring between event times") {
    // max date = Jun 30 (u5, censored at horizon 3). Lifetimes:
    // u1: 5 (ends day 6, uncensored), u2: 5 (uncensored),
    // u3: 10 (uncensored), u4: 8 but last day 29 → within 3 of max →
    // CENSORED at t=8, u5: 20 censored. N=5.
    // t=5: n=5, d=2 → S = 0.6
    // t=8: censored exits only (no row: d=0)
    // t=10: n_risk = 5 − (2 + 1) = 2, d=1 → S = 0.6·(1−½) = 0.3
    val e = events(
      user(1, 1, 6) ++ user(2, 1, 6) ++ user(3, 10, 20) ++
        user(4, 21, 29) ++ user(5, 10, 30))
    val got = Survival.kaplanMeier(e, horizonDays = 3)
      .select("t_days", "n_risk", "n_events", "survival")
      .as[(Long, Long, Long, Double)].collect()
    assert(got.toSeq == Seq((5L, 5L, 2L, 0.6), (10L, 2L, 1L, 0.3)))
  }

  test("km: terminal full-exit pins survival to exactly 0") {
    // both users end uncensored at the same lifetime → d = n at the
    // only point; survival must be 0.0, not a log(0) artifact
    val e = events(user(1, 1, 6) ++ user(2, 2, 7) ++ user(3, 1, 30))
    // u3 censored (horizon 3); u1, u2 lifetime 5, n_risk 3? No:
    // u3 lifetime 29 — exits AFTER t=5, so n_risk at 5 is 3, d=2,
    // S=1/3; at t=29 d=0 (censored) → no row
    val got = Survival.kaplanMeier(e, horizonDays = 3)
      .select("t_days", "n_risk", "n_events", "survival")
      .as[(Long, Long, Long, Double)].collect()
    assert(got.toSeq == Seq((5L, 3L, 2L, 0.333333)))
    // now NO censoring: everyone exits → last point hits d = n_risk
    val all = events(user(1, 1, 6) ++ user(2, 2, 7))
    val z = Survival.kaplanMeier(all, horizonDays = 0)
      .select("survival").as[Double].collect()
    assert(z.last == 0.0)
  }

  test("log-rank: hand-computed chi-square on separated cohorts") {
    // cohort A (u1, u2) dies at t=5; cohort B (u3, u4) at t=10; u5
    // (B) censored. At t=5: d=2, d1=0, n=5, n1=3 → E1=1.2, V=0.36.
    // At t=10: d=2=d1, n=n1=3 → E1=2, V=0 (cohort-pure risk set).
    // χ² = (2 − 3.2)²/0.36 = 4.0 → significant at 95, not 99
    val e = events(
      user(1, 1, 6) ++ user(2, 1, 6) ++ user(3, 10, 20) ++
        user(4, 5, 15) ++ user(5, 1, 30))
    val r = Survival.logRank(e, col("user_id") >= 3, horizonDays = 3)
      .select("n_times", "o1", "e1", "chi_sq", "sig_95", "sig_99")
      .collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 3.2 && r.getDouble(3) == 4.0)
    assert(r.getBoolean(4) && !r.getBoolean(5))
  }

  test("log-rank: identical cohorts score ~0 chi-square") {
    // perfectly interleaved cohorts with identical lifetimes
    val e = events(user(1, 1, 6) ++ user(2, 1, 6) ++
      user(3, 2, 12) ++ user(4, 2, 12) ++ user(5, 1, 30))
    val chi = Survival.logRank(e, col("user_id") % 2 === 0,
      horizonDays = 3)
      .select("chi_sq").as[Double].collect().head
    // u1/u2 share t=5, u3/u4 share t=10 — one from each cohort at
    // every event time → O1 tracks E1 closely
    assert(chi < 1.0, s"matched cohorts must not separate: $chi")
  }

  test("cuped: perfect covariate removes all variance; constant covariate none") {
    val u = (1 to 12).map { i =>
      val x = (i % 4 + 1).toDouble
      (i % 2 == 0, 2.0 * x, x)   // y = 2x exactly → rho = 1
    }.toDF("b", "y", "x")
    val r = Experiment.cuped(u, col("b"), col("y"), col("x"))
      .select("theta", "var_adjusted", "var_reduction").collect().head
    assert(r.getDouble(0) == 2.0)
    assert(r.getDouble(1) == 0.0 && r.getDouble(2) == 1.0)
    val const = (1 to 12).map(i => (i % 2 == 0, (i % 4).toDouble, 7.0))
      .toDF("b", "y", "x")
    val rc = Experiment.cuped(const, col("b"), col("y"), col("x"))
      .select("theta", "var_reduction").collect().head
    assert(rc.getDouble(0) == 0.0 && rc.getDouble(1) == 0.0,
      "zero-variance covariate must degrade to no adjustment, not NaN")
  }

  test("power: hand-computed per-arm n from a known variance") {
    // m = (1, 3): var_samp = 2, n_units = 2
    val u = Seq((1L, 1.0), (2L, 3.0)).toDF("user_id", "m")
    val r = Experiment.powerAnalysis(u, col("m"), mde = 1.0)
      .select("n_units", "variance", "n_per_arm_80", "n_per_arm_90",
        "mde_at_current_n").collect().head
    assert(r.getLong(0) == 2L && r.getDouble(1) == 2.0)
    val n80 = math.ceil(4.0 * math.pow(1.959964 + 0.841621, 2)).toLong
    val n90 = math.ceil(4.0 * math.pow(1.959964 + 1.281552, 2)).toLong
    assert(r.getLong(2) == n80 && r.getLong(3) == n90)
    val mdeNow = BigDecimal(math.sqrt(
      4.0 * math.pow(1.959964 + 0.841621, 2)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(4) == mdeNow)
  }

  test("did: common shocks cancel; a treated-only shift is recovered exactly") {
    // both arms drift +5 pre→post (seasonality); treated arm gets an
    // EXTRA +3. Naive post-pre in B reads 8; DiD must read exactly 3.
    val u = (0 until 20).map { i =>
      val base = ((i / 2) % 4).toDouble
      val b = i % 2 == 1
      (b, 10.0 + base, 15.0 + base + (if (b) 3.0 else 0.0))
    }.toDF("b", "pre", "post")
    val r = Experiment.diffInDiff(u, col("b"), col("pre"), col("post"))
      .select("did", "post_b", "pre_b", "se", "sig_95").collect().head
    assert(r.getDouble(0) == 3.0, s"DiD must strip the common +5: $r")
    assert(r.getDouble(1) - r.getDouble(2) == 8.0,
      "naive treated post-pre reads the confounded 8")
    assert(r.getDouble(3) == 0.0 && r.getBoolean(4) == false,
      "deterministic deltas → zero clustered SE, t pinned 0 (no evidence scale)")
  }

  test("segment lift: only the planted segment discovers; BH inflates its p") {
    // segment "hot": B runs +10 over tight noise; "cold" segments:
    // identical arms → z = 0, p = 1
    val rows = (0 until 40).flatMap { u =>
      val noise = ((u / 2) % 3).toDouble   // pairs share their noise
      Seq(("hot", u % 2 == 0, if (u % 2 == 0) 20.0 + noise else 10.0 + noise),
        ("cold1", u % 2 == 0, 5.0 + noise),
        ("cold2", u % 2 == 0, 5.0 + noise))
    }.toDF("seg", "b", "m")
    val got = Experiment.segmentLift(rows, col("b"), col("seg"), col("m"))
      .select("segment", "p", "p_adj", "discovery")
      .as[(String, Double, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("hot")._3, s"planted segment must survive BH: $got")
    assert(!got("cold1")._3 && !got("cold2")._3)
    // BH with family size 3 and the other two p = 1: the smallest p
    // is multiplied by 3/1
    assert(got("hot")._2 == math.min(1.0,
      BigDecimal(got("hot")._1 * 3).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) ||
      got("hot")._2 >= got("hot")._1)
    assert(got("cold1")._1 == 1.0 && got("cold1")._2 == 1.0)
  }

  test("quantile lift: constant offset shows at every level") {
    val u = ((1 to 50).map(i => (false, (i % 10).toDouble)) ++
      (1 to 50).map(i => (true, (i % 10).toDouble + 4.0)))
      .toDF("b", "m")
    val got = Experiment.quantileLift(u, col("b"), col("m"))
      .select("level", "lift").as[(Double, Double)].collect()
    assert(got.length == 5)
    assert(got.forall(_._2 == 4.0),
      s"pure shift → +4 at every quantile: ${got.toSeq}")
  }

  test("msprt: planted lift rejects and stays rejected; null stays quiet") {
    import java.sql.Date
    def day(i: Int) = Date.valueOf(f"2024-07-$i%02d")
    // 10 days × 10 units/arm/day; B runs +5 against within-arm noise
    // of ±1 → the sequential test must cross 0.05 and latch
    val lifted = (1 to 10).flatMap { d =>
      (1 to 10).flatMap { u =>
        Seq((false, day(d), 10.0 + (u % 3)), (true, day(d), 15.0 + (u % 3)))
      }
    }.toDF("b", "d", "m")
    val got = Experiment.sequentialMsprt(lifted, col("b"), col("d"),
      col("m"), tau = 5.0)
      .select("d", "p_always_valid", "rejected_95")
      .as[(Date, Double, Boolean)].collect()
    assert(got.last._3, s"planted +50% lift must reject: ${got.last}")
    // always-valid p is a running min — monotone non-increasing
    assert(got.sliding(2).forall(p => p(1)._2 <= p(0)._2))
    // once rejected, stays rejected
    val firstRej = got.indexWhere(_._3)
    assert(firstRej >= 0 && got.drop(firstRej).forall(_._3))
    // identical arms: p stays at 1 the whole way
    val nul = (1 to 10).flatMap { d =>
      (1 to 10).flatMap { u =>
        Seq((false, day(d), 10.0 + (u % 3)), (true, day(d), 10.0 + (u % 3)))
      }
    }.toDF("b", "d", "m")
    val pn = Experiment.sequentialMsprt(nul, col("b"), col("d"),
      col("m"), tau = 5.0)
      .select("p_always_valid").as[Double].collect()
    assert(pn.forall(_ == 1.0), s"zero-diff arms must never reject")
  }

  test("srm: hand chi-square flags a planted imbalance, passes a clean split") {
    // 60 / 40 against a designed 50/50: chi = (10² / 50)·2 = 4.0
    val skew = ((1 to 60).map(i => (i.toLong, false)) ++
      (61 to 100).map(i => (i.toLong, true))).toDF("id", "b")
    val r = Experiment.srmCheck(skew, col("b"))
      .select("chi_sq", "srm_95", "srm_99").collect().head
    assert(r.getDouble(0) == 4.0 && r.getBoolean(1) && !r.getBoolean(2))
    val clean = (1 to 100).map(i => (i.toLong, i % 2 == 0)).toDF("id", "b")
    val rc = Experiment.srmCheck(clean, col("b"))
      .select("chi_sq", "srm_95").collect().head
    assert(rc.getDouble(0) == 0.0 && !rc.getBoolean(1))
  }

  test("welch: hand-computed t on unequal-variance groups") {
    // A = (1, 2, 3): mean 2, var 1; B = (4, 6, 8, 10): mean 7, var 20/3
    // sa = 1/3, sb = 5/3 → t = 5/√2 = 3.535534
    // df = 4 / (1/18 + 25/27) = 4.075472
    val u = (Seq(1.0, 2.0, 3.0).map(v => (false, v)) ++
      Seq(4.0, 6.0, 8.0, 10.0).map(v => (true, v)))
      .toDF("b", "m")
    val r = Experiment.welchTTest(u, col("b"), col("m"))
      .select("n_a", "n_b", "mean_a", "mean_b", "lift", "t_stat", "df",
        "sig_95", "sig_99")
      .collect().head
    assert((r.getLong(0), r.getLong(1)) == ((3L, 4L)))
    assert((r.getDouble(2), r.getDouble(3), r.getDouble(4)) ==
      ((2.0, 7.0, 5.0)))
    assert(r.getDouble(5) == 3.535534)
    assert(r.getDouble(6) == 4.075472)
    assert(r.getBoolean(7) && r.getBoolean(8))
  }

  test("mann-whitney: hand U and z; outlier immunity vs welch") {
    // A = (1,2,3), B = (4,5,6): no ties. Pooled ranks 1..6,
    // Ra = 6 → U_a = 0, μ = 4.5, σ = √(9·7/12) = 2.291288
    // z = −1.963961 (just over the 95% line)
    val u = (Seq(1.0, 2.0, 3.0).map(v => (false, v)) ++
      Seq(4.0, 5.0, 6.0).map(v => (true, v))).toDF("b", "m")
    val r = Experiment.mannWhitneyU(u, col("b"), col("m"))
      .select("u_a", "z", "sig_95").collect().head
    assert(r.getDouble(0) == 0.0)
    assert(r.getDouble(1) == -1.963961)
    assert(r.getBoolean(2))
    // a huge outlier in A flips Welch's mean but not one single rank:
    // U is unchanged except A's outlier now ranks top
    val out = (Seq(1.0, 2.0, 1e9).map(v => (false, v)) ++
      Seq(4.0, 5.0, 6.0).map(v => (true, v))).toDF("b", "m")
    val rz = Experiment.mannWhitneyU(out, col("b"), col("m"))
      .select("z").as[Double].collect().head
    assert(math.abs(rz) < 1.0, s"rank test shrugs at the outlier: $rz")
    val wz = Experiment.welchTTest(out, col("b"), col("m"))
      .select("t_stat").as[Double].collect().head
    assert(math.abs(wz) < math.abs(-1.9),
      "welch collapses under the outlier variance — the reason U exists")
  }

  test("mann-whitney: all-tied data yields z = 0 via the tie correction") {
    val u = (1 to 10).map(i => (i % 2 == 0, 5.0)).toDF("b", "m")
    val r = Experiment.mannWhitneyU(u, col("b"), col("m"))
      .select("u_a", "z").collect().head
    // every rank is the average 5.5 → Ra = 27.5, U_a = 12.5 = μU;
    // the tie correction zeroes σ_U, so z must be the pinned 0
    assert(r.getDouble(0) == 12.5)
    assert(r.getDouble(1) == 0.0)
  }

  test("ratio delta: identical groups have zero lift; scaling the numerator moves only the ratio") {
    // pairs (2k, 2k+1) carry identical (x, y) into opposite variants
    val base = (0 until 20).map { i =>
      (i % 2 == 0, ((i / 2) % 5 + 1).toDouble, ((i / 2) % 3 + 2).toDouble)
    }.toDF("b", "x", "y")
    val r0 = Experiment.ratioDelta(base, col("b"), col("x"), col("y"))
      .select("lift", "sig_95").collect().head
    // parity groups see the same (x, y) multiset → lift exactly 0
    assert(r0.getDouble(0) == 0.0 && !r0.getBoolean(1))
    // doubling B's numerator doubles only ratio_b
    val shifted = base.withColumn("x",
      when(col("b"), col("x") * 2.0).otherwise(col("x")))
    val r1 = Experiment.ratioDelta(shifted, col("b"), col("x"), col("y"))
      .select("ratio_a", "ratio_b").as[(Double, Double)].collect().head
    assert(r1._2 == 2.0 * r1._1)
  }

  test("ratio delta: correlated denominator shrinks the variance vs independent") {
    // x perfectly proportional to y → the ratio is CONSTANT per unit:
    // delta-method variance must collapse to ~0
    val prop = (1 to 20).map { i =>
      (i % 2 == 0, 3.0 * (i % 4 + 1), (i % 4 + 1).toDouble)
    }.toDF("b", "x", "y")
    val se = Experiment.ratioDelta(prop, col("b"), col("x"), col("y"))
      .select("se").as[Double].collect().head
    assert(se == 0.0, s"constant per-unit ratio → zero se, got $se")
  }

  test("welch: no-effect data is insignificant and symmetric") {
    val u = (1 to 40).map(i => (i % 2 == 0, (i % 5).toDouble))
      .toDF("b", "m")
    val r = Experiment.welchTTest(u, col("b"), col("m"))
      .select("lift", "sig_95").collect().head
    assert(math.abs(r.getDouble(0)) < 0.5 && !r.getBoolean(1))
  }

  test("rmst: hand-computed area and Klein–Moeschberger variance") {
    // lifetimes 1,1,2,2 all uncensored (horizonDays = 0): KM is
    // S(1)=0.5, S(2)=0; RMST = 1·1 + 0.5·1 = 1.5, τ = 2.
    // Var: t=1 → A = 1.5−1 = 0.5, term 0.5²·2/(4·2) = 0.0625;
    // t=2 → d=n skipped. SE = 0.25.
    val rows = Seq(user(1, 1, 2), user(2, 1, 2), user(3, 1, 3),
      user(4, 1, 3)).flatten
    val r = Survival.rmst(events(rows), horizonDays = 0).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 1.5)
    assert(r.getDouble(3) == 0.25)
  }

  test("rmst: everyone-survives-to-the-end gives area = tau") {
    // all four users share lifetime 3, all uncensored → single step
    // where the whole risk set exits: S jumps 1 → 0 at t=3, so the
    // area is 1·3 = 3 and the variance term is skipped (d = n).
    val rows = Seq(user(1, 1, 4), user(2, 1, 4), user(3, 1, 4),
      user(4, 1, 4)).flatten
    val r = Survival.rmst(events(rows), horizonDays = 0).collect().head
    assert(r.getLong(0) == 3L && r.getDouble(2) == 3.0)
    assert(r.getDouble(3) == 0.0)
  }

  test("gehan-wilcoxon: identical cohorts read zero, separated reject") {
    // parity cohorts with identical lifetime multisets → every event
    // time has d1 = d·n1/n exactly → w_diff = 0, chi = 0
    val same = Seq(user(1, 1, 2), user(2, 1, 2), user(3, 1, 4),
      user(4, 1, 4), user(5, 1, 6), user(6, 1, 6)).flatten
    val r0 = Survival.gehanWilcoxon(events(same),
      col("user_id") % 2 === 1, horizonDays = 0).collect().head
    assert(r0.getDouble(2) == 0.0 && r0.getDouble(4) == 0.0)
    assert(!r0.getBoolean(5))
    // odd users all die day 1, even users all at day 9: maximal
    // early separation → chi well past 3.841
    val sep = (1L to 16L).map(i =>
      user(i, 1, if (i % 2 == 1) 2 else 10)).flatten
    val r1 = Survival.gehanWilcoxon(events(sep),
      col("user_id") % 2 === 1, horizonDays = 0).collect().head
    assert(r1.getBoolean(5), s"chi=${r1.getDouble(4)}")
    // weights are normalized: w_var stays O(1)
    assert(r1.getDouble(3) < 10.0)
  }
}
