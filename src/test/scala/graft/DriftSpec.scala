package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Drift, Sessionize}

class DriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("psi: identical distributions score ~0; a planted shift scores high") {
    val base = (1 to 100).map(i => (i % 10) * 10.0).toDF("v")
    val same = Drift.psiReport(base, base, "v", bucketWidth = 10.0)
    assert(same.agg(sum("psi_term")).collect()(0).getDouble(0) == 0.0)
    // current shifted entirely into two buckets the baseline barely has
    val cur = (1 to 100).map(i => 80.0 + (i % 2) * 10.0).toDF("v")
    val drifted = Drift.psiReport(base, cur, "v", bucketWidth = 10.0)
    assert(drifted.agg(sum("psi_term")).collect()(0).getDouble(0) > 0.25)
    // psi terms are non-negative and empty buckets are floored, not ±inf
    val terms = drifted.select("psi_term").as[Double].collect()
    assert(terms.forall(t => t >= 0.0 && !t.isInfinite && !t.isNaN))
  }

  test("psi term math: hand-computed two-bucket case") {
    val base = Seq(1.0, 1.0, 1.0, 11.0).toDF("v")     // p = .75 / .25
    val cur = Seq(1.0, 11.0, 11.0, 11.0).toDF("v")    // p = .25 / .75
    val got = Drift.psiReport(base, cur, "v", bucketWidth = 10.0)
      .select("bucket", "psi_term").as[(Long, Double)].collect().toMap
    val expect = BigDecimal((0.25 - 0.75) * math.log(0.25 / 0.75))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0L) == expect && got(1L) == expect)
  }

  test("wasserstein: identical slices score 0; a pure shift scores its size") {
    val base = (1 to 100).map(i => (i % 10) * 10.0).toDF("v")
    val same = Drift.wassersteinReport(base, base, "v", 10.0)
      .select("w1").as[Double].collect()
    assert(same.forall(_ == 0.0))
    // shift every value by exactly 3 buckets (30 units): W1 = 30
    val shifted = (1 to 100).map(i => (i % 10) * 10.0 + 30.0).toDF("v")
    val w1 = Drift.wassersteinReport(base, shifted, "v", 10.0)
      .select("w1").as[Double].collect().head
    assert(w1 == 30.0)
  }

  test("ks-fdr: pure noise stays quiet; a planted shift is the top discovery") {
    val rnd = new scala.util.Random(31)
    def corpus(shift: Double) = (0 until 10).flatMap { s =>
      val sh = if (s == 7) shift else 0.0
      (1 to 400).map(_ => (s"src$s",
        sh + math.abs(rnd.nextGaussian()) * 100))
    }.toDF("source", "v")
    // no shift anywhere: BH must keep finite-sample noise quiet
    val quiet = Drift.ksBySliceFdr(corpus(0.0), "source", "v", 50.0)
      .select("discovery").as[Boolean].collect()
    assert(quiet.count(identity) == 0, "pure noise fired an alarm")
    // hard shift: src7 must be discovered with the strictly smallest
    // adjusted p. (Null slices MAY also fire — each is tested against
    // a complement CONTAINING the outlier slice, so "different from
    // the rest" is genuinely true of them too; the ranking is the
    // operator's contract, quietness belongs to the null world above.)
    val got = Drift.ksBySliceFdr(corpus(500.0), "source", "v", 50.0)
      .select("slice", "p_adj", "discovery")
      .as[(String, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("src7")._2, s"the planted shift must be discovered: $got")
    assert(got.filterNot(_._1 == "src7")
      .forall(_._2._1 >= got("src7")._1))
  }

  test("width advisor: hand-computed FD width; degenerate IQR gives null count") {
    // v = 1..8: q1 = 2.75, q3 = 6.25 (quantile_cont), iqr = 3.5,
    // h = 2·3.5/8^(1/3) = 3.5, range 7 → 2 buckets
    val df = (1 to 8).map(i => (i.toDouble, 5.0)).toDF("v", "k")
    val got = Drift.bucketWidthAdvisor(df, Seq("v", "k"))
      .select("column", "n", "iqr", "fd_width", "n_buckets")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3),
          if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    assert(got("v") == ((8L, 3.5, 3.5, 2L)))
    // constant column: iqr 0 → width 0 → bucket count undefined
    assert(got("k") == ((8L, 0.0, 0.0, -1L)))
  }

  test("quantile align: identical source has zero shift, offset source a constant one") {
    // src "b" is exactly src "a" + 100 → every level shifts by its
    // offset from the POOLED distribution, monotone in level
    val rows = (1 to 9).map(i => ("a", i * 10.0)) ++
      (1 to 9).map(i => ("b", i * 10.0 + 100.0))
    val got = Drift.quantileAlign(rows.toDF("source", "v"), "source", "v",
      levels = Seq(0.0, 0.5, 1.0))
      .select("source", "level", "src_q", "pooled_q", "shift")
      .as[(String, Double, Double, Double, Double)].collect()
    val bySrc = got.groupBy(_._1)
    // pooled p50 interpolates the gap between 90 and 110 → 100
    val a50 = got.find(r => r._1 == "a" && r._2 == 0.5).get
    val b50 = got.find(r => r._1 == "b" && r._2 == 0.5).get
    assert(a50._3 == 50.0 && b50._3 == 150.0 && a50._4 == 100.0)
    assert(b50._5 - a50._5 == 100.0,
      "the constant offset must appear as a constant shift gap")
    // the shared extremes touch the pooled envelope (shift 0 there),
    // interior levels shift toward each source's side
    assert(bySrc("a").forall(r => r._5 <= 0) &&
      bySrc("b").forall(r => r._5 >= 0))
    assert(a50._5 == -50.0 && b50._5 == 50.0)
  }

  test("width advisor: sub-rounding IQR still yields a bucket count") {
    // v spaced 1e-7 apart: iqr = 3.5e-7, h = 2·3.5e-7/8^(1/3) = 3.5e-7
    // — ROUNDS to 0.000000 at 6 decimals, but the gate is the raw
    // q3 > q1 (the oracle's CASE), so n_buckets = ceil(7e-7/3.5e-7) = 2
    val tiny = (0 to 7).map(i => i * 1e-7).toDF("v")
    val row = Drift.bucketWidthAdvisor(tiny, Seq("v"))
      .select("fd_width", "n_buckets").collect().head
    assert(row.getDouble(0) == 0.0, "displayed width rounds to 0")
    assert(!row.isNullAt(1) && row.getLong(1) == 2L,
      "bucket count must come from the unrounded width")
  }

  test("ks-fdr: BH step-up math on hand p-values via identical slices") {
    // all slices identical → D ≈ 0, p ≈ 1, adj = 1, no discoveries
    val rows = (0 until 4).flatMap { s =>
      (1 to 100).map(i => (s"s$s", (i % 10) * 10.0)) }
    val got = Drift.ksBySliceFdr(rows.toDF("source", "v"),
      "source", "v", 10.0)
      .select("ks_d", "p_adj", "discovery")
      .as[(Double, Double, Boolean)].collect()
    assert(got.forall(r => r._1 == 0.0 && r._2 == 1.0 && !r._3))
  }

  test("wasserstein: hand-computed two-bucket case with units") {
    // base mass (.75, .25) on buckets 0,1; cur (.25, .75); width 10
    // cdfs: base (.75, 1), cur (.25, 1) → |Δ| = (.5, 0) → W1 = 5.0
    val base = Seq(1.0, 1.0, 1.0, 11.0).toDF("v")
    val cur = Seq(1.0, 11.0, 11.0, 11.0).toDF("v")
    val rows = Drift.wassersteinReport(base, cur, "v", 10.0)
      .select("bucket", "w1_term", "w1")
      .as[(Long, Double, Double)].collect().toList
    assert(rows == List((0L, 5.0, 5.0), (1L, 0.0, 5.0)))
  }

  test("chi-square: hand-computed 2x2 case; identical mixes score 0") {
    // base: 30 a / 10 b; cur: 10 a / 30 b. Totals: rt_a=40, rt_b=40,
    // gt=80, side totals 40/40 → every E = 20; contrib per category =
    // (30-20)^2/20 + (10-20)^2/20 = 10; chi2 = 20, dof = 1.
    val base = (Seq.fill(30)("a") ++ Seq.fill(10)("b")).toDF("c")
    val cur = (Seq.fill(10)("a") ++ Seq.fill(30)("b")).toDF("c")
    val got = Drift.chiSquare(base, cur, "c")
      .select("category", "base_n", "exp_base", "contrib", "chi2", "dof")
      .as[(String, Long, Double, Double, Double, Long)].collect()
    assert(got.toSeq == Seq(("a", 30L, 20.0, 10.0, 20.0, 1L),
      ("b", 10L, 20.0, 10.0, 20.0, 1L)))
    // same mix on both sides → statistic exactly 0
    val same = Drift.chiSquare(base, base, "c")
      .select("chi2").as[Double].collect()
    assert(same.forall(_ == 0.0))
    // category present on only one side is kept with a 0 count, not NaN
    val lop = Drift.chiSquare(base, Seq("z").toDF("c"), "c")
      .select("category", "contrib").as[(String, Double)].collect().toMap
    assert(lop.keySet == Set("a", "b", "z") &&
      lop.values.forall(v => !v.isNaN && !v.isInfinite))
  }

  test("transition matrix: strict per-user ordering with tie-break, probs sum to 1") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), "a"),
      (1L, 11L, ts("2024-01-01 10:01:00"), "b"),
      (1L, 12L, ts("2024-01-01 10:02:00"), "a"),
      // same-timestamp pair for u2: event_id breaks the tie → c then a
      (2L, 20L, ts("2024-01-01 09:00:00"), "c"),
      (2L, 21L, ts("2024-01-01 09:00:00"), "a"),
      (3L, 30L, ts("2024-01-01 08:00:00"), "a"))  // singleton: no transition
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = Sessionize.transitionMatrix(events)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("a", "b", 1L, 1.0),
      ("b", "a", 1L, 1.0),
      ("c", "a", 1L, 1.0)))
    // per-from probabilities always sum to 1
    val sums = Sessionize.transitionMatrix(events)
      .groupBy("from_type").agg(sum("prob").as("s"))
      .select("s").as[Double].collect()
    assert(sums.forall(_ == 1.0))
  }

  test("embeddingDrift: hand-computed centroids, orthogonal shift and no-shift") {
    def frame(rows: Seq[(Long, Int, Seq[Float])]) =
      rows.toDF("vec_id", "label", "embedding")
    // label 0: old centroid (1,0) [two identical vectors], new (0,1)
    //   → cos 0, L2 sqrt(2)
    // label 1: identical both sides → cos 1, L2 0
    val oldE = frame(Seq(
      (1L, 0, Seq(1f, 0f)), (2L, 0, Seq(1f, 0f)),
      (3L, 1, Seq(3f, 4f))))
    val newE = frame(Seq(
      (4L, 0, Seq(0f, 1f)),
      (5L, 1, Seq(3f, 4f)), (6L, 1, Seq(3f, 4f))))
    val got = Drift.embeddingDrift(oldE, newE)
      .as[(Int, Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      (0, 2L, 1L, 0.0, math.sqrt(2.0) match { case r => math.rint(r * 1e6) / 1e6 }),
      (1, 1L, 2L, 1.0, 0.0)), got.toString)
    // mixed centroid: label 0 old vectors (1,0) and (0,1) → centroid
    // (.5,.5); new (1,1) → cos exactly 1 (same direction), L2 > 0
    val mixOld = frame(Seq((1L, 0, Seq(1f, 0f)), (2L, 0, Seq(0f, 1f))))
    val mixNew = frame(Seq((3L, 0, Seq(1f, 1f))))
    val mix = Drift.embeddingDrift(mixOld, mixNew)
      .as[(Int, Long, Long, Double, Double)].collect().head
    assert(mix._4 == 1.0 && mix._5 > 0.7 && mix._5 < 0.71, mix.toString)
  }

  test("ks: identical samples give D=0, not drifted") {
    val a = (1 to 100).map(_.toDouble).toDF("v")
    val r = Drift.ksReport(a, a, "v").collect()(0)
    assert(r.getAs[Double]("ks_stat") == 0.0)
    assert(!r.getAs[Boolean]("drifted"))
    assert(r.getAs[Long]("n_a") == 100L && r.getAs[Long]("n_b") == 100L)
  }

  test("ks: disjoint supports give D=1 and a drift verdict") {
    val a = (1 to 50).map(_.toDouble).toDF("v")
    val b = (101 to 150).map(_.toDouble).toDF("v")
    val r = Drift.ksReport(a, b, "v").collect()(0)
    assert(r.getAs[Double]("ks_stat") == 1.0)
    assert(r.getAs[Boolean]("drifted"))
  }

  test("ks: hand-checked sup gap with ties") {
    // a = {1,1,2,3}, b = {2,3,3,4}: F_a - F_b peaks at v=1: 0.5 - 0 = 0.5
    val a = Seq(1.0, 1.0, 2.0, 3.0).toDF("v")
    val b = Seq(2.0, 3.0, 3.0, 4.0).toDF("v")
    val r = Drift.ksReport(a, b, "v").collect()(0)
    assert(r.getAs[Double]("ks_stat") == 0.5, r.toString)
    // critical value at n=4,4: 1.358 * sqrt(8/16) = 0.960251
    assert(math.abs(r.getAs[Double]("crit_05") - 0.960251) < 1e-6)
    assert(!r.getAs[Boolean]("drifted"))
  }

  test("ks grid: boundary-exact and within one bucket mass of the exact D") {
    val rnd = new scala.util.Random(5L)
    val a = Seq.fill(400)(rnd.nextDouble() * 10).toDF("v")
    val b = Seq.fill(400)(rnd.nextDouble() * 10 + 1.5).toDF("v") // shifted
    val exact = Drift.ksReport(a, b, "v").collect()(0)
      .getAs[Double]("ks_stat")
    val grid = Drift.ksReport(a, b, "v", Some(0.5)).collect()(0)
      .getAs[Double]("ks_stat")
    assert(grid <= exact + 1e-9, "grid D can only understate")
    // largest single-bucket mass bounds the understatement; with 800
    // pooled points over ~23 buckets of width 0.5 that is well under 0.15
    assert(exact - grid <= 0.15, s"exact $exact vs grid $grid")
    assert(grid > 0.1, "a 1.5 shift on range 10 must still register on the grid")
  }

  test("equi-depth psi: identical sides score zero with near-uniform buckets") {
    val v = (1 to 1000).map(_.toDouble).toDF("v")
    val rows = Drift.psiEquiDepth(v, v, "v", nBins = 10).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getAs[Double]("psi_term")).sum == 0.0)
    // each bucket holds ~100 of 1000 baseline rows
    rows.foreach(r => assert(math.abs(r.getAs[Long]("base_n") - 100L) <= 1))
  }

  test("equi-depth psi: a shifted current lights up tail buckets") {
    val base = (1 to 1000).map(_.toDouble).toDF("v")
    val cur = (1 to 1000).map(x => x.toDouble + 500).toDF("v")
    val rows = Drift.psiEquiDepth(base, cur, "v", nBins = 10).collect()
    val psi = rows.map(_.getAs[Double]("psi_term")).sum
    assert(psi > 0.25, s"a half-range shift must be major drift, got $psi")
    // top bucket (beyond the last baseline edge) gains mass
    val top = rows.maxBy(_.getLong(0))
    assert(top.getAs[Long]("cur_n") > top.getAs[Long]("base_n"))
  }

  test("equi-depth psi beats fixed-width on a heavy-tail shift") {
    // heavy tail: 99% of mass in [0,1), 1% spread to 1e6. A width-1e4
    // grid puts ~all mass in bucket 0 and cannot see a shift WITHIN
    // the bulk; equi-depth bins the bulk finely and does.
    val rnd = new scala.util.Random(11L)
    def sample(shift: Double) = Seq.fill(2000) {
      if (rnd.nextDouble() < 0.99) rnd.nextDouble() + shift
      else rnd.nextDouble() * 1e6
    }.toDF("v")
    val base = sample(0.0); val cur = sample(0.4)
    val fixed = Drift.psiReport(base, cur, "v", bucketWidth = 1e4)
      .agg(org.apache.spark.sql.functions.sum("psi_term"))
      .collect()(0).getDouble(0)
    val depth = Drift.psiEquiDepth(base, cur, "v", nBins = 10)
      .collect().map(_.getAs[Double]("psi_term")).sum
    assert(depth > fixed + 0.1,
      s"equi-depth ($depth) must detect the in-bulk shift fixed-width ($fixed) misses")
  }
}
