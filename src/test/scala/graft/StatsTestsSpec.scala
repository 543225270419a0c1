package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Anomaly, Curation, Drift, Experiment, Vocab}

/** Independent in-memory references for the round-11 statistics tier:
  * Kruskal–Wallis, Ljung–Box, Page–Hinkley, UniMax water-filling,
  * Rényi entropies, Anderson–Darling 2-sample. */
class StatsTestsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(id: Long, user: Long, day: Int, etype: String,
      value: Double) =
    (id, java.sql.Timestamp.valueOf(f"2024-04-$day%02d 12:00:00"),
      user, etype, value, "{}")

  private def events(rows: Seq[(Long, java.sql.Timestamp, Long, String,
      Double, String)]) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("kruskal-wallis equals the textbook rank computation") {
    // three groups with ties across groups
    val data = Seq(
      "a" -> 1.0, "a" -> 2.0, "a" -> 2.0, "a" -> 5.0,
      "b" -> 2.0, "b" -> 6.0, "b" -> 7.0,
      "c" -> 7.0, "c" -> 8.0, "c" -> 9.0, "c" -> 9.0)
    val got = Experiment.kruskalWallis(
      data.toDF("g", "m"), col("g"), col("m")).collect().head
    // reference: average ranks
    val sorted = data.map(_._2).sorted
    val rank = sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, xs) => v -> (xs.map(_._2 + 1).sum.toDouble / xs.size) }
    val n = data.size.toDouble
    val byG = data.groupBy(_._1).map { case (g, xs) =>
      (xs.map(x => rank(x._2)).sum, xs.size.toDouble) }
    val h = 12.0 / (n * (n + 1.0)) *
      byG.map { case (r, ni) => r * r / ni }.sum - 3.0 * (n + 1.0)
    val ties = sorted.groupBy(identity).values
      .map(t => math.pow(t.size, 3) - t.size).sum
    val hTie = h / (1.0 - ties / (n * n * n - n))
    assert(got.getLong(0) == 11L && got.getLong(1) == 3L)
    assert(math.abs(got.getDouble(2) - h) < 1e-6, s"h: $got vs $h")
    assert(math.abs(got.getDouble(3) - hTie) < 1e-6)
    assert(got.getLong(4) == 2L)
  }

  test("ljung-box equals the direct Q formula on the daily series") {
    // 12 days with varying counts
    val counts = Seq(3, 5, 2, 8, 4, 6, 1, 7, 5, 3, 6, 2)
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      (1 to c).map(k => ev(d * 100L + k, k.toLong, d + 1, "view", 1.0)) }
    val got = Anomaly.ljungBox(events(rows), maxLag = 3).collect().head
    val xs = counts.map(_.toDouble)
    val mu = xs.sum / xs.size
    val den = xs.map(x => (x - mu) * (x - mu)).sum
    def acf(k: Int) = BigDecimal(
      xs.dropRight(k).zip(xs.drop(k))
        .map { case (a, b) => (a - mu) * (b - mu) }.sum / den)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val nD = xs.size.toDouble
    val q = nD * (nD + 2.0) *
      (1 to 3).map(k => acf(k) * acf(k) / (nD - k)).sum
    assert(got.getLong(0) == 12L && got.getLong(1) == 3L)
    assert(math.abs(got.getDouble(2) - q) < 1e-5, s"q: $got vs $q")
  }

  test("page-hinkley: alarm trace on a planted level shift") {
    // 6 quiet days then 4 shifted days; delta=0, default lambda high —
    // use explicit lambda so the shift alarms
    val rows = (1 to 6).map(d => ev(d.toLong, 1L, d, "buy", 10.0)) ++
      (7 to 10).map(d => ev(d.toLong, 1L, d, "buy", 100.0))
    val got = Anomaly.pageHinkley(events(rows), delta = 0.0,
      lambda = 50.0).collect()
    assert(got.length == 10)
    // reference recursion
    var (sum0, n0, m, mMin) = (0.0, 0, 0.0, Double.MaxValue)
    val ref = (Seq.fill(6)(10.0) ++ Seq.fill(4)(100.0)).map { x =>
      sum0 += x; n0 += 1
      val mean = sum0 / n0
      m += x - mean
      mMin = math.min(mMin, m)
      (m, mMin)
    }
    got.zip(ref).foreach { case (r, (em, emin)) =>
      assert(math.abs(r.getDouble(3) - em) < 1e-6)
      assert(math.abs(r.getDouble(4) - emin) < 1e-6)
      assert(r.getBoolean(5) == (em - emin > 50.0))
    }
    assert(got.take(6).forall(!_.getBoolean(5)), "quiet days must not alarm")
    assert(got.drop(6).exists(_.getBoolean(5)), "the shift must alarm")
  }

  test("unimax water-filling: hand case with both regimes") {
    // strata token counts 1, 2, 25 at maxEpochs=4 → caps 4, 8, 100.
    // budget = 2× corpus = 56: smallest two capped (4·3=12 ≤ 56;
    // 8·2=16 ≤ 52), big one gets θ = (56−12)/1 = 44 → 1.76 epochs.
    val docs = (
      Seq((1L, "x", "aa")) ++
      Seq((2L, "y", "b b")) ++
      (3 to 7).map(i => (i.toLong, "z", "c c c c c"))
    ).toDF("doc_id", "lang", "text")
    val got = Curation.unimaxAllocation(docs, budgetTokensPerCorpus = 2.0,
      maxEpochs = 4.0).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5)))).toMap
    assert(got("x") == ((1L, 4L, 4.0, 4.0, true)))
    assert(got("y") == ((2L, 8L, 8.0, 4.0, true)))
    assert(got("z") == ((25L, 100L, 44.0, 1.76, false)))
  }

  test("unimax: budget above total caps leaves everyone capped") {
    val docs = Seq((1L, "x", "a a"), (2L, "y", "b b b"))
      .toDF("doc_id", "lang", "text")
    val got = Curation.unimaxAllocation(docs, budgetTokensPerCorpus = 10.0,
      maxEpochs = 2.0).collect()
    got.foreach { r =>
      assert(r.getBoolean(5), s"all capped: $r")
      assert(r.getDouble(3) == r.getLong(2).toDouble)
    }
  }

  test("renyi profile: uniform and degenerate distributions") {
    // source u: 4 distinct tokens once each → every entropy = 2 bits,
    // eff_vocab = 4. source d: one token ×8 → all zeros, eff_vocab 1.
    val docs = Seq(
      (1L, "u", "alpha beta gamma delta"),
      (2L, "d", "same same same same same same same same"))
      .toDF("doc_id", "source", "text")
    val got = Vocab.renyiProfile(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val u = got("u")
    assert(u.getLong(1) == 4L && u.getLong(2) == 4L)
    assert(math.abs(u.getDouble(3) - 2.0) < 1e-9)
    assert(math.abs(u.getDouble(4) - 2.0) < 1e-9)
    assert(math.abs(u.getDouble(5) - 2.0) < 1e-9)
    assert(math.abs(u.getDouble(6) - 4.0) < 1e-9)
    val d = got("d")
    assert(d.getDouble(3) == 0.0 && d.getDouble(4) == 0.0 &&
      d.getDouble(5) == 0.0 && d.getDouble(6) == 1.0)
    // Rényi ordering on a skewed distribution: H_½ ≥ H_1 ≥ H_2
    val skew = Seq((1L, "s", "a a a a b b c d")).toDF("doc_id", "source", "text")
    val s = Vocab.renyiProfile(skew).collect().head
    assert(s.getDouble(4) >= s.getDouble(3) && s.getDouble(3) >= s.getDouble(5))
  }

  test("anderson-darling equals a direct reference implementation") {
    def refA2(a: Seq[Double], b: Seq[Double]): Double = {
      val na = a.size.toDouble; val nb = b.size.toDouble
      val nn = na + nb
      val zs = (a ++ b).distinct.sorted
      var (ba, maA, maB) = (0.0, 0.0, 0.0)
      var s = 0.0
      zs.foreach { z =>
        val la = a.count(_ == z).toDouble
        val lb = b.count(_ == z).toDouble
        val l = la + lb
        val baj = ba + l / 2.0
        val maj = maA + la / 2.0
        val mbj = maB + lb / 2.0
        val den = baj * (nn - baj) - nn * l / 4.0
        if (den > 0.0) {
          s += l / nn * math.pow(nn * maj - na * baj, 2) / den / na
          s += l / nn * math.pow(nn * mbj - nb * baj, 2) / den / nb
        }
        ba += l; maA += la; maB += lb
      }
      (nn - 1.0) / nn * s
    }
    val a = Seq(1.0, 2.0, 2.0, 3.5, 4.0, 7.0, 8.0)
    val b = Seq(2.0, 5.0, 6.0, 6.5, 9.0, 11.0)
    val df = (a.map(false -> _) ++ b.map(true -> _)).toDF("b", "m")
    val got = Drift.adTwoSample(df, col("b"), col("m")).collect().head
    assert(got.getLong(0) == 7L && got.getLong(1) == 6L)
    assert(math.abs(got.getDouble(2) - refA2(a, b)) < 1e-6,
      s"a2: ${got.getDouble(2)} vs ${refA2(a, b)}")
    // identical samples → A² near its null expectation, far below the
    // rejection region; shifted samples → large
    val same = Drift.adTwoSample(
      (a.map(false -> _) ++ a.map(true -> _)).toDF("b", "m"),
      col("b"), col("m")).collect().head.getDouble(2)
    val shifted = Drift.adTwoSample(
      (a.map(false -> _) ++ a.map(x => true -> (x + 50.0))).toDF("b", "m"),
      col("b"), col("m")).collect().head.getDouble(2)
    assert(shifted > same + 1.0, s"shift must dominate: $shifted vs $same")
  }

  test("cramer-von mises: hand case, zero on identical, shift dominates") {
    // A={1,2}, B={3,4}: cumulative ECDF gaps 0.5, 1, 0.5, 0 →
    // Σ l·gap² = 1.5, T = (2·2/4²)·1.5 = 0.375
    val df = (Seq(1.0, 2.0).map(false -> _) ++
      Seq(3.0, 4.0).map(true -> _)).toDF("b", "m")
    val got = Drift.cvmTwoSample(df, col("b"), col("m")).collect().head
    assert(got.getLong(0) == 2L && got.getLong(1) == 2L)
    assert(math.abs(got.getDouble(2) - 0.375) < 1e-9)
    // identical samples: every cumulative gap is 0 → T = 0
    val a = Seq(1.0, 2.0, 2.0, 3.5, 4.0, 7.0, 8.0)
    val same = Drift.cvmTwoSample(
      (a.map(false -> _) ++ a.map(true -> _)).toDF("b", "m"),
      col("b"), col("m")).collect().head
    assert(same.getDouble(2) == 0.0 && !same.getBoolean(3))
    val shifted = Drift.cvmTwoSample(
      (a.map(false -> _) ++ a.map(x => true -> (x + 50.0))).toDF("b", "m"),
      col("b"), col("m")).collect().head
    assert(shifted.getDouble(2) > 0.461 && shifted.getBoolean(3))
  }

  test("one-way anova equals the textbook sums-of-squares computation") {
    // groups A=(1,2,3), B=(4,5,6): SSB = 13.5, SSW = 4, MSW = 1,
    // F = 13.5, eta² = 13.5/17.5, omega² = (13.5−1)/(17.5+1)
    val df = (Seq(1.0, 2.0, 3.0).map("a" -> _) ++
      Seq(4.0, 5.0, 6.0).map("b" -> _)).toDF("g", "x")
    val r = graft.operators.Anova.onewayF(df, col("g"), col("x"))
      .collect().head
    assert(r.getLong(0) == 6L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 1L && r.getLong(3) == 4L)
    assert(math.abs(r.getDouble(4) - 13.5) < 1e-6)
    assert(math.abs(r.getDouble(5) - 13.5 / 17.5) < 1e-6)
    assert(math.abs(r.getDouble(6) - 12.5 / 18.5) < 1e-6)
    // (k−1)·F = 13.5 > 3.841459
    assert(r.getBoolean(7))
    // equal group means → F = 0, not significant
    val flat = (Seq(1.0, 3.0).map("a" -> _) ++ Seq(1.0, 3.0).map("b" -> _))
      .toDF("g", "x")
    val f = graft.operators.Anova.onewayF(flat, col("g"), col("x"))
      .collect().head
    assert(f.getDouble(4) == 0.0 && !f.getBoolean(7))
    // degenerate design (k = 1): F undefined but sig_95 coalesces to
    // FALSE, the house convention (pageTrend/kendallW/bartelsRank)
    val solo = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "x")
    val d = graft.operators.Anova.onewayF(solo, col("g"), col("x"))
      .collect().head
    assert(d.isNullAt(4) && !d.isNullAt(7) && !d.getBoolean(7))
  }

  test("sample entropy: constant-series counts are exact combinatorics") {
    // constant daily counts: σ=0 → r=0, every template matches.
    // n=6 days → B = C(5,2) = 10, A = C(4,2) = 6, SampEn = −ln(0.6)
    val rows = (1 to 6).flatMap(d =>
      (1 to 3).map(k => ev(d * 10L + k, k.toLong, d, "view", 1.0)))
    val r = Anomaly.sampleEntropy(events(rows)).collect().head
    assert(r.getLong(0) == 6L && r.getDouble(1) == 0.0)
    assert(r.getLong(2) == 10L && r.getLong(3) == 6L)
    assert(math.abs(r.getDouble(4) - -math.log(0.6)) < 1e-6)
    // an irregular series keeps fewer long templates than a periodic
    // one of the same values → higher SampEn
    val periodic = (1 to 12).flatMap(d =>
      (1 to (if (d % 2 == 0) 8 else 2)).map(k =>
        ev(d * 100L + k, k.toLong, d, "view", 1.0)))
    val irregular = Seq(2, 8, 2, 2, 8, 8, 2, 8, 8, 2, 2, 8)
      .zipWithIndex.flatMap { case (c, d0) =>
        (1 to c).map(k => ev((d0 + 1) * 100L + k, k.toLong,
          d0 + 1, "view", 1.0)) }
    val sp = Anomaly.sampleEntropy(events(periodic)).collect()
      .head.getDouble(4)
    val si = Anomaly.sampleEntropy(events(irregular)).collect()
      .head.getDouble(4)
    assert(sp < si, s"periodic $sp must read more regular than $si")
  }

  test("energy distance: zero on identical cohorts, exact on separated") {
    // identical daily multisets → e = 0
    val same = (1 to 3).map(d =>
      ev(d.toLong, 1L, d, "view", 5.0 + d)) ++
      (1 to 3).map(d => ev((10 + d).toLong, 2L, d, "view", 5.0 + d))
    val r0 = Drift.energyDistance(events(same), col("user_id") === 2L)
      .collect().head
    assert(r0.getDouble(2) == 0.0)
    // A days sum {0,0}, B days {10,10}: E|X−Y|=10, within = 0 →
    // e = 20, T = (2·2/4)·20 = 20
    val sep = Seq(ev(1, 1, 1, "view", 0.0), ev(2, 1, 2, "view", 0.0),
      ev(3, 2, 1, "view", 10.0), ev(4, 2, 2, "view", 10.0))
    val r1 = Drift.energyDistance(events(sep), col("user_id") === 2L)
      .collect().head
    assert(r1.getLong(0) == 2L && r1.getLong(1) == 2L)
    assert(r1.getDouble(2) == 20.0 && r1.getDouble(3) == 20.0)
  }

  test("distance correlation: exact 1 on a perfect linear law") {
    import graft.operators.Causality
    // day d: d views (x = d) and one purchase of value 2d (y = 2d) —
    // b-matrix = 2·a-matrix, so dCor is exactly 1
    val rows = (1 to 8).flatMap { d =>
      (1 to d).map(k => ev(d * 100L + k, k.toLong, d, "view", 1.0)) :+
        ev(d * 100L + 99, 1L, d, "purchase", 2.0 * d)
    }
    val r = Causality.distanceCorrelation(events(rows)).collect().head
    assert(r.getLong(0) == 8L)
    assert(r.getDouble(4) == 1.0, s"dcor=${r.getDouble(4)}")
    // constant traffic series → NULL (zero distance variance)
    val flat = (1 to 5).flatMap(d => Seq(
      ev(d * 10L, 1L, d, "view", 1.0),
      ev(d * 10L + 1, 1L, d, "purchase", d.toDouble)))
    val rf = Causality.distanceCorrelation(events(flat)).collect().head
    assert(rf.isNullAt(4))
  }

  test("seasonal mann-kendall: within-weekday drift found, pure cycle not") {
    import graft.operators.Anomaly
    // 4 weeks: counts = weekday level only (pure cycle, no drift) →
    // every within-season pair ties, S = 0
    val cyc = (0 until 28).flatMap { i =>
      val lvl = (i % 7) + 1
      (1 to lvl * 2).map(k =>
        ev(i * 100L + k, k.toLong, i + 1, "view", 1.0))
    }
    // (April has 30 days — days 1..28 span exactly 4 weeks)
    val r0 = Anomaly.seasonalMannKendall(events(cyc)).collect().head
    assert(r0.getLong(2) == 0L && r0.getString(5) == "none")
    // cycle PLUS within-weekday growth: every within-season pair
    // increases → S = k_seasons · C(4,2) = 7 · 6 = 42
    val grow = (0 until 28).flatMap { i =>
      val lvl = (i % 7) + 1 + (i / 7) * 10
      (1 to lvl).map(k =>
        ev(i * 100L + k, k.toLong, i + 1, "view", 1.0))
    }
    val r1 = Anomaly.seasonalMannKendall(events(grow)).collect().head
    assert(r1.getLong(1) == 7L && r1.getLong(2) == 42L)
    assert(r1.getString(5) == "up", s"z=${r1.getDouble(4)}")
  }

  test("bartels rank: monotone series reads trending, alternating oscillates") {
    import graft.operators.Anomaly
    def series(ys: Seq[Double]) = events(ys.zipWithIndex.map {
      case (y, i) => ev(i * 10L + 1, 1L, i + 1, "view", y) })
    // strictly increasing daily revenue: successive rank diffs all 1
    // → RVN = (n−1)/Σ(r−r̄)² · ... far below 2 → trending
    val up = Anomaly.bartelsRank(series((1 to 20).map(_.toDouble)))
      .collect().head
    assert(up.getString(4) == "trending", s"rvn=${up.getDouble(1)}")
    // RVN exact for 1..n ranks: num = n−1, den = n(n²−1)/12
    val n = 20.0
    assert(math.abs(up.getDouble(1) -
      (n - 1.0) / (n * (n * n - 1.0) / 12.0)) < 1e-6)
    // alternating high/low: rank jumps maximal → RVN ≫ 2
    val alt = Anomaly.bartelsRank(series(
      (1 to 20).map(i => if (i % 2 == 0) i.toDouble else 100.0 + i)))
      .collect().head
    assert(alt.getString(4) == "oscillating", s"rvn=${alt.getDouble(1)}")
  }

  test("watson u2: uniform hours accept, a spike rejects, rotation-invariant") {
    def at(h: Int, k: Int, id0: Long) = (0 until k).map(i =>
      (id0 + i, java.sql.Timestamp.valueOf(f"2024-04-05 $h%02d:00:00"),
        1L, "view", 1.0, "{}"))
    def run(rows: Seq[(Long, java.sql.Timestamp, Long, String,
        Double, String)]) =
      Drift.watsonU2(rows.toDF("event_id", "ts", "user_id",
        "event_type", "value", "props")).collect().head
    val uni = (0 until 24).flatMap(h => at(h, 10, h * 100L))
    val rU = run(uni)
    assert(!rU.getBoolean(3), s"u2=${rU.getDouble(2)}")
    // grouped-data correction: a flat histogram's only U² mass is
    // the n/(12·24²) discretization term, which is subtracted — so
    // flat reads ≈ 0 and stays an ACCEPT at any n (the uncorrected
    // statistic crossed 0.187 at n ≳ 1300 on perfectly flat data)
    assert(math.abs(rU.getDouble(2)) < 1e-6, s"u2=${rU.getDouble(2)}")
    val bigUni = (0 until 24).flatMap(h => at(h, 200, h * 1000L))
    val rBig = run(bigUni)   // n = 4800, past the old false-reject n
    assert(!rBig.getBoolean(3), s"u2=${rBig.getDouble(2)}")
    val spike = at(12, 240, 0L)
    assert(run(spike).getBoolean(3))
    // rotation invariance: the same bump at hour 0 and at hour 12
    // reads the SAME U² (this is the property Kuiper/W² have and a
    // plain CvM against the cut circle does not)
    def bump(at0: Int) = (0 until 24).flatMap(h =>
      at(h, if (h == at0) 100 else 10, h * 100L))
    val u0 = run(bump(0)).getDouble(2)
    val u12 = run(bump(12)).getDouble(2)
    assert(math.abs(u0 - u12) < 1e-6, s"u0=$u0 u12=$u12")
  }

  test("kuiper: uniform hours accept, a single-hour spike rejects") {
    // perfectly uniform over all 24 hours: both D⁺ and D⁻ compare
    // cum/n against the same discrete lattice CDF (h+1)/24, so an
    // exactly flat histogram yields V = 0 (the mixed-edge convention
    // read V = 2/24 on flat data and auto-rejected for n ≳ 435); a
    // point mass at hour 12 drives V toward 1+
    def at(h: Int, k: Int, id0: Long) = (0 until k).map(i =>
      (id0 + i, java.sql.Timestamp.valueOf(f"2024-04-05 $h%02d:00:00"),
        1L, "view", 1.0, "{}"))
    val uni = (0 until 24).flatMap(h => at(h, 10, h * 100L))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rU = Drift.kuiperUniformity(uni).collect().head
    assert(rU.getLong(0) == 240L && !rU.getBoolean(4),
      s"v=${rU.getDouble(3)}")
    assert(rU.getDouble(1) == 0.0 && rU.getDouble(2) == 0.0 &&
      rU.getDouble(3) == 0.0)
    // the n-regression the mixed-edge bug had: flat at n = 2400
    // (past the old n ≳ 435 auto-reject ceiling) still accepts
    val big = (0 until 24).flatMap(h => at(h, 100, h * 1000L))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rB = Drift.kuiperUniformity(big).collect().head
    assert(rB.getLong(0) == 2400L && !rB.getBoolean(4),
      s"v=${rB.getDouble(3)}")
    val spike = at(12, 240, 0L)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rS = Drift.kuiperUniformity(spike).collect().head
    assert(rS.getBoolean(4) && rS.getDouble(3) > 0.9)
  }

  test("wilson intervals: boundary exactness and a replayed midcase") {
    import graft.operators.Experiment
    val df = (Seq.fill(5)(("a", false)) ++       // 0/5
      Seq.fill(4)(("b", true)) ++                 // 4/4
      (Seq.fill(2)(("c", true)) ++ Seq.fill(6)(("c", false))))  // 2/8
      .toDF("s", "ok")
    val r = Experiment.wilsonIntervals(df, col("s"), col("ok"))
      .collect().map(x => x.getString(0) -> x).toMap
    // p̂ = 0: the Wilson lower bound is EXACTLY 0 (Wald would be too,
    // but with zero width — here the upper bound stays informative)
    assert(r("a").getDouble(4) == 0.0 && r("a").getDouble(5) > 0.2)
    // p̂ = 1: upper bound exactly 1
    assert(r("b").getDouble(5) == 1.0 && r("b").getDouble(4) < 0.8)
    // p̂ = 0.25, n = 8: replay the closed form
    val z = 1.959964; val n = 8.0; val p = 0.25
    val den = 1.0 + z * z / n
    val c = (p + z * z / (2 * n)) / den
    val h = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / den
    assert(math.abs(r("c").getDouble(4) - (c - h)) < 1e-6)
    assert(math.abs(r("c").getDouble(5) - (c + h)) < 1e-6)
  }

  test("hodges-lehmann: median of cross-pair differences, exactly") {
    import graft.operators.Experiment
    // cohort A days sum 1,2,3; cohort B days sum 11,12,13 →
    // 9 pairwise differences with median 10
    val rows = (1 to 3).map(d => ev(d.toLong, 1L, d, "view", d.toDouble)) ++
      (1 to 3).map(d => ev((10 + d).toLong, 2L, d, "view", d + 10.0))
    val r = Experiment.hodgesLehmann(events(rows),
      col("user_id") === 2L).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L && r.getLong(2) == 9L)
    assert(r.getDouble(3) == 10.0)
    // outlier immunity: one whale day in B moves the mean, not HL
    val whale = rows.map { case t @ (id, ts, u, e, v, p) =>
      if (id == 13L) (id, ts, u, e, 1000.0, p) else t }
    val rw = Experiment.hodgesLehmann(events(whale),
      col("user_id") === 2L).collect().head
    assert(rw.getDouble(3) == 10.0, s"hl moved: ${rw.getDouble(3)}")
  }

  test("icc(1): hand-computed unbalanced case and degenerate guard") {
    import graft.operators.Anova
    // groups A={1,3}, B={7,9}: SSB=36, SSW=4, MSB=36, MSW=2, n0=2 →
    // ICC = 34/38
    val r = Anova.icc1(
      Seq(("a", 1.0), ("a", 3.0), ("b", 7.0), ("b", 9.0)).toDF("g", "x"),
      col("g"), col("x")).collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 2.0)
    assert(r.getDouble(3) == 18.0, "F ratio MSB/MSW = 36/2")
    assert(math.abs(r.getDouble(4) - 34.0 / 38.0) < 1e-6)
    // constant-within groups: zero within variance → NULL family
    val flat = Anova.icc1(
      Seq(("a", 5.0), ("a", 5.0), ("b", 9.0), ("b", 9.0)).toDF("g", "x"),
      col("g"), col("x")).collect().head
    assert(flat.isNullAt(4))
  }

  test("atkinson: zero on equal values, hand case on {1,3}") {
    import graft.operators.Inequality
    val eq = Inequality.atkinson(Seq(5.0, 5.0, 5.0).toDF("x"), col("x"))
      .collect().head
    assert(eq.getDouble(2) == 0.0 && eq.getDouble(3) == 0.0 &&
      eq.getDouble(4) == 0.0)
    // {1,3}: mean 2; A½ = 1 − ((1+√3)/2)²/2; A₁ = 1 − √3/2;
    // A₂ = 1 − 1.5/2 (harmonic mean 1.5)
    val r = Inequality.atkinson(Seq(1.0, 3.0).toDF("x"), col("x"))
      .collect().head
    assert(r.getLong(0) == 2L && r.getDouble(1) == 2.0)
    val mh = (1.0 + math.sqrt(3.0)) / 2.0
    assert(math.abs(r.getDouble(2) - (1.0 - mh * mh / 2.0)) < 1e-6)
    assert(math.abs(r.getDouble(3) - (1.0 - math.sqrt(3.0) / 2.0)) < 1e-6)
    assert(math.abs(r.getDouble(4) - 0.25) < 1e-9)
    // ordering: higher ε is more bottom-sensitive → A½ < A₁ < A₂
    assert(r.getDouble(2) < r.getDouble(3) &&
      r.getDouble(3) < r.getDouble(4))
  }
}
