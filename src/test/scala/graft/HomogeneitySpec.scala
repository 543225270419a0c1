package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Causality, Elasticity, Homogeneity, Inequality,
  Spectral, TruncatedRecall}
import graft.quality.Inclusion

/** Planted-case semantics for the r11 stats batch: Granger,
  * Brown–Forsythe, Friedman, Theil decomposition, IND discovery,
  * truncated-dim recall. */
class HomogeneitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("granger: x that deterministically leads y wins its direction") {
    // x_t follows a noisy-ish deterministic walk; y_t = 10 * x_{t-1}.
    // Then lagged x explains y perfectly (F -> huge or SSE_u -> 0)
    // while lagged y adds nothing to predicting x beyond x's own lag.
    val n = 40
    // memoryless pseudo-random x (hash mix): no lag structure of its
    // own, so the reverse direction has nothing to find
    val xs = (0 until n).map(t =>
      (((t + 1) * 2654435761L) % 97).toDouble / 97.0 * 10.0 + 1.0)
    val rows = (1 until n).flatMap { t =>
      val day = f"2024-01-${(t % 28) + 1}%02d"
      // encode the two series as purchase value vs non-purchase count:
      // one purchase row carrying y_t, round(x_t) non-purchase rows
      val d = java.sql.Date.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(t))
      val y = 10.0 * xs(t - 1)
      Seq((java.sql.Timestamp.valueOf(d.toLocalDate.atStartOfDay),
        "purchase", y)) ++
        (0 until xs(t).toInt).map(_ =>
          (java.sql.Timestamp.valueOf(d.toLocalDate.atStartOfDay),
            "view", 0.0))
    }
    val ev = rows.toDF("ts", "event_type", "value")
    val r = Causality.granger(ev).collect()
      .map(x => x.getString(0) -> x).toMap
    val fXY = Option(r("x->y").get(5)).map(_.asInstanceOf[Double])
    val fYX = Option(r("y->x").get(5)).map(_.asInstanceOf[Double])
    // x->y: either F is enormous or the unrestricted SSE collapsed to
    // 0 (perfect fit -> guarded NULL); y->x must be unimpressive
    assert(fXY.forall(_ > 50.0), s"fXY=$fXY")
    assert(fYX.exists(_ < 10.0), s"fYX=$fYX")
  }

  test("brown-forsythe: unequal spreads detected, equal spreads not") {
    def grp(g: String, center: Double, spread: Double) =
      (0 until 60).map(i =>
        (g, center + spread * ((i % 21) - 10) / 10.0))
    val uneq = (grp("a", 100.0, 1.0) ++ grp("b", 100.0, 40.0))
      .toDF("g", "x")
    val eq = (grp("a", 100.0, 10.0) ++ grp("b", 300.0, 10.0))
      .toDF("g", "x")
    val fU = Homogeneity.brownForsythe(uneq, col("g"), col("x"))
      .collect()(0).getDouble(2)
    val fE = Homogeneity.brownForsythe(eq, col("g"), col("x"))
      .collect()(0).getDouble(2)
    assert(fU > 30.0, s"unequal spreads F=$fU")
    assert(fE < 1e-6, s"equal spreads F=$fE (identical |z| patterns)")
  }

  test("friedman: consistent treatment order maximizes chi2") {
    // 12 blocks, 4 treatments; treatment t always ranks t-th
    val consistent = (1 to 12).flatMap(b =>
      (1 to 4).map(t => (s"b$b", s"t$t", t * 100.0 + b)))
      .toDF("b", "t", "x")
    val r = Homogeneity.friedman(consistent, col("b"), col("t"),
      col("x")).collect()
    val chi2 = r(0).getDouble(4)
    // perfect agreement: chi2 = n(k-1) = 12*3 = 36
    assert(math.abs(chi2 - 36.0) < 1e-9, s"chi2=$chi2")
    assert(r.map(_.getDouble(3)).toSeq == Seq(1.0, 2.0, 3.0, 4.0),
      "mean ranks follow the planted order")
    // incomplete blocks are dropped: add a block missing t4
    val withHole = consistent.union(
      Seq(("b99", "t1", 1.0), ("b99", "t2", 2.0), ("b99", "t3", 3.0))
        .toDF("b", "t", "x"))
    val r2 = Homogeneity.friedman(withHole, col("b"), col("t"),
      col("x")).collect()
    assert(r2.forall(_.getLong(1) == 12L), "hole block dropped")
  }

  test("quade replays a hand-computed 5x3 panel with tied block ranges") {
    // blocks (by date) x treatments a/b/c; ranges 2,8,1,15,8 — the
    // tie between blocks 2 and 5 pins the (range, block) tie-break.
    // Hand computation: S = (-15, 15, 0), A = 110, B = 90,
    // F = (b-1)B/(A-B) = 4*90/20 = 18, df = (2, 8).
    val rows = Seq(
      ("2024-01-01", "a", 10.0), ("2024-01-01", "b", 12.0),
      ("2024-01-01", "c", 11.0),
      ("2024-02-01", "a", 20.0), ("2024-02-01", "b", 28.0),
      ("2024-02-01", "c", 24.0),
      ("2024-03-01", "a", 5.0), ("2024-03-01", "b", 6.0),
      ("2024-03-01", "c", 5.5),
      ("2024-04-01", "a", 30.0), ("2024-04-01", "b", 45.0),
      ("2024-04-01", "c", 33.0),
      ("2024-05-01", "a", 1.0), ("2024-05-01", "b", 9.0),
      ("2024-05-01", "c", 2.0)).toDF("b", "t", "x")
    val r = Homogeneity.quade(rows, col("b"), col("t"), col("x"))
      .collect()
    assert(r.map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    assert(r.forall(_.getLong(1) == 5L))
    assert(r.map(_.getDouble(2)).toSeq == Seq(-15.0, 15.0, 0.0))
    assert(r.forall(x => math.abs(x.getDouble(3) - 18.0) < 1e-9))
    assert(r.forall(x => x.getLong(4) == 2L && x.getLong(5) == 8L))
    // single block: A = B identically (Cauchy-Schwarz equality at
    // b = 1) and df2 = 0 → NULL F
    val sep = Seq(("2024-01-01", "a", 1.0), ("2024-01-01", "b", 2.0))
      .toDF("b", "t", "x")
    val rs = Homogeneity.quade(sep, col("b"), col("t"), col("x"))
      .collect()
    assert(rs.forall(x => x.isNullAt(3) && x.getLong(5) == 0L))
  }

  test("conover-iman post-hoc separates planted pairs and spares the tied pair") {
    // 25 blocks, 4 treatments: t0/t1 swap order block-by-block (rank
    // sums 37 vs 38 — indistinguishable), t2/t3 always rank 3rd/4th.
    // Hand computation: A = 750, B = 737.52, se² = 8.6667, df = 72,
    // m = 6 → Bonferroni level 1 − 0.05/12, crit = 2.713108;
    // t(0,1) = 1/2.9439 = 0.3397 (ns), every other pair ≥ 8.49 (sig).
    val rows = for {
      i <- 0 until 25
      (t, x) <- Seq(
        ("t0", if (i % 2 == 1) 0.1 else 0.0),
        ("t1", if (i % 2 == 1) 0.0 else 0.1),
        ("t2", 2.0), ("t3", 3.0))
    } yield (f"2020-${i / 28 + 1}%02d-${i % 28 + 1}%02d", t, x)
    val r = Homogeneity.conoverIman(rows.toDF("b", "t", "x"),
      col("b"), col("t"), col("x")).collect()
    assert(r.length == 6)
    val byPair = r.map(x =>
      (x.getString(0), x.getString(1)) -> x).toMap
    assert(r.forall(_.getLong(7) == 72L))
    assert(math.abs(byPair(("t0", "t1")).getDouble(5) - 2.713108) < 1e-4,
      s"crit=${byPair(("t0", "t1")).getDouble(5)}")
    assert(math.abs(byPair(("t0", "t1")).getDouble(4) - 0.339683) < 1e-4)
    assert(!byPair(("t0", "t1")).getBoolean(6), "tied pair must be ns")
    assert(r.filterNot(x => x.getString(0) == "t0" &&
      x.getString(1) == "t1").forall(_.getBoolean(6)),
      "planted pairs must all be significant")
    // perfectly consistent rankings: se = 0 → NULL stat, unequal
    // rank sums still read as different (Conover's convention)
    val consistent = (1 to 25).flatMap(b =>
      (1 to 4).map(t => (s"b$b%02d", s"t$t", t * 10.0)))
      .toDF("b", "t", "x")
    val rc = Homogeneity.conoverIman(consistent, col("b"), col("t"),
      col("x")).collect()
    assert(rc.forall(x => x.isNullAt(4) && x.getBoolean(6)))
  }

  test("theil: identity holds and equal values give zero") {
    val docs = Seq(("a", 100L), ("a", 200L), ("a", 400L),
      ("b", 1000L), ("b", 2000L), ("b", 4000L))
      .toDF("source", "n_chars")
    val r = Inequality.theilDecomposition(docs, col("source"),
      col("n_chars")).collect()
    val (tt, tb, tw) = (r(0).getDouble(6), r(0).getDouble(7),
      r(0).getDouble(8))
    assert(math.abs(tt - (tb + tw)) < 1e-5, "decomposition identity")
    assert(tb > 0.0 && tw > 0.0)
    // same within-group shape => within terms equal across groups
    assert(math.abs(r(0).getDouble(4) - r(1).getDouble(4)) < 1e-6)
    val flat = Seq(("a", 100L), ("a", 100L), ("b", 100L))
      .toDF("source", "n_chars")
    val f = Inequality.theilDecomposition(flat, col("source"),
      col("n_chars")).collect()
    assert(math.abs(f(0).getDouble(6)) < 1e-9, "equal values -> T=0")
  }

  test("ind discovery: planted subset and disjoint sets") {
    val small = (1L to 50L).toDF("k")
    val big = (1L to 100L).toDF("k")
    val other = (1000L to 1009L).toDF("k")
    val r = Inclusion.indReport(Seq(
      "s.k" -> (small, "k"), "b.k" -> (big, "k"),
      "o.k" -> (other, "k")))
      .collect()
      .map(x => (x.getString(0), x.getString(1)) -> x).toMap
    assert(r(("s.k", "b.k")).getBoolean(5), "s fully inside b")
    assert(!r(("b.k", "s.k")).getBoolean(5))
    assert(r(("b.k", "s.k")).getDouble(4) == 0.5)
    assert(r(("o.k", "b.k")).getLong(3) == 0L, "disjoint overlap 0")
    assert(r.size == 6, "full ordered pair grid")
  }

  test("elasticity: a planted log-log law is recovered exactly") {
    // qty = 100 * price^(-2) exactly => elasticity -2, r2 = 1
    val prices = Seq(1.0, 2.0, 4.0, 5.0, 8.0)
    val li = prices.zipWithIndex.map { case (p, i) =>
      val q = 100.0 * math.pow(p, -2.0)
      // extendedprice = price * qty at zero discount
      (i.toLong, q, p * q, 0.0)
    }.toDF("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val part = (0L until 5L).map(k => (k, "B1")).toDF("p_partkey", "p_brand")
    val r = Elasticity.byBrand(li, part).collect()(0)
    assert(math.abs(r.getDouble(2) - -2.0) < 1e-6, s"eps=${r.getDouble(2)}")
    assert(r.getDouble(3) == 1.0)
  }

  test("cochran q: identical participation gives 0, planted skew doesn't") {
    // every user does all 3 types -> rows are saturated, Q guard NULL
    // (denominator k*SR - SR2 = 0); balanced-but-unsaturated -> Q = 0
    val balanced = (1L to 12L).flatMap(u =>
      Seq("a", "b").map(t => (u, t)) ) // each user does a and b of 3
      .toDF("u", "t")
      .union(Seq((99L, "c"), (98L, "c")).toDF("u", "t"))
    val skew = ((1L to 20L).map(u => (u, "a")) ++
      (1L to 2L).map(u => (u, "b")))
      .toDF("u", "t")
    val rSkew = Homogeneity.cochranQ(skew, col("u"), col("t"))
      .collect()
    val q = rSkew(0).getDouble(4)
    assert(q > 10.0, s"planted skew Q=$q")
    assert(rSkew.map(_.getString(0)).toSeq == Seq("a", "b"))
    assert(rSkew(0).getLong(2) == 20L && rSkew(1).getLong(2) == 2L)
  }

  test("spectral summary: planted weekly cycle concentrates the spectrum") {
    val rows = (0 until 84).map { d =>
      val day = java.time.LocalDate.of(2024, 1, 1).plusDays(d)
      val v = 100.0 + 50.0 * math.sin(2 * math.Pi * (d % 7) / 7.0)
      (java.sql.Timestamp.valueOf(day.atStartOfDay), "purchase", v)
    }.toDF("ts", "event_type", "value")
    val r = Spectral.spectralSummary(rows).collect()(0)
    assert(r.getInt(1) == 7, s"dominant=${r.getInt(1)}")
    assert(r.getDouble(2) > 0.8, "energy concentrates at period 7")
    assert(r.getDouble(3) < 0.5, "low entropy for a tonal series")
    assert(r.getDouble(4) < 0.2, "low flatness for a tonal series")
  }

  test("truncated recall: native dim recovers recall 1.0, prefix noise hurts") {
    // vectors whose FIRST 2 dims are identical noise and whose last
    // dims carry identity: truncating to m=2 must lose recall
    val vecs = (0L until 30L).map { i =>
      (i, Array(1.0f, 1.0f,
        math.sin(i * 1.7).toFloat, math.cos(i * 2.3).toFloat,
        ((i % 5) / 5.0).toFloat, ((i % 7) / 7.0).toFloat))
    }.toDF("vec_id", "embedding")
    val r = TruncatedRecall.recallCurve(vecs,
      vecs.filter(col("vec_id") < 4), k = 5, dims = Seq(2, 6))
      .collect().map(x => x.getLong(0) -> x.getDouble(3)).toMap
    assert(r(6L) == 1.0, "full dim is exact by construction")
    assert(r(2L) < 1.0, "identity dims truncated away")
  }
}
