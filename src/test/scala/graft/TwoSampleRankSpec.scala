package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TwoSampleRank

class TwoSampleRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // A = {1,3,5}, B = {2,4,6}: N = 6, no ties, midranks 1..6,
  // B holds ranks {2,4,6} — every constant below is hand-computed
  private def interleaved =
    (Seq(1.0, 3.0, 5.0).map(false -> _) ++
      Seq(2.0, 4.0, 6.0).map(true -> _)).toDF("b", "m")

  test("cucconi replays the hand-computed no-ties case") {
    val r = TwoSampleRank.cucconi(interleaved, col("b"), col("m"))
      .collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    // S2 = 4+16+36 = 56; den = sqrt(9*7*13*59/5); U = 63/den
    val den = math.sqrt(9.0 * 7 * 13 * 59 / 5)
    assert(math.abs(r.getDouble(2) - 63.0 / den) < 1e-6)
    assert(math.abs(r.getDouble(3) - -63.0 / den) < 1e-6)
    // rho = 64/767 - 1; C = (U²+V²-2ρUV)/(2(1-ρ²))
    val u = 63.0 / den; val rho = 64.0 / 767 - 1
    val c = (2 * u * u - 2 * rho * (-u * u)) / (2 * (1 - rho * rho))
    assert(math.abs(r.getDouble(4) - c) < 1e-6)
    assert(!r.getBoolean(5))
  }

  test("cucconi under ties: identical cohorts give U = V, tiny C") {
    val df = (Seq(1.0, 2.0, 3.0).map(false -> _) ++
      Seq(1.0, 2.0, 3.0).map(true -> _)).toDF("b", "m")
    val r = TwoSampleRank.cucconi(df, col("b"), col("m"))
      .collect().head
    // midranks 1.5/3.5/5.5 on both sides: S2 = 44.75, U = -4.5/den
    val den = math.sqrt(9.0 * 7 * 13 * 59 / 5)
    assert(math.abs(r.getDouble(2) - -4.5 / den) < 1e-6)
    assert(math.abs(r.getDouble(2) - r.getDouble(3)) < 1e-9)
    // C = u²/(1+ρ) with u = −4.5/den — tiny relative to the 2.9957
    // critical value
    assert(r.getDouble(4) < 0.05 && !r.getBoolean(5))
  }

  test("cucconi flags a joint location+scale shift a large sample") {
    // B = 3·A + 40: mean and spread both move
    val a = (1 to 200).map(_.toDouble)
    val df = (a.map(false -> _) ++ a.map(x => true -> (x * 3 + 40)))
      .toDF("b", "m")
    val r = TwoSampleRank.cucconi(df, col("b"), col("m"))
      .collect().head
    assert(r.getBoolean(5), s"c=${r.getDouble(4)}")
  }

  test("lepage replays the hand-computed case and the chi2 gate") {
    val r = TwoSampleRank.lepage(interleaved, col("b"), col("m"))
      .collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    // W = 12, E = 10.5, Var = 9/5 * (91/6 - 12.25) = 5.25
    assert(math.abs(r.getDouble(2) - 1.5 / math.sqrt(5.25)) < 1e-6)
    // AB scores (1,2,3,3,2,1): A-stat = 6 = E → z_a = 0
    assert(math.abs(r.getDouble(3)) < 1e-9)
    assert(math.abs(r.getDouble(4) - 1.5 * 1.5 / 5.25) < 1e-6)
    assert(!r.getBoolean(5))
    // pure scale change (same center): Lepage must reject where a
    // pure location test would sleep
    val sym = (-100 to 100).map(_.toDouble / 10)
    val scale = (sym.map(false -> _) ++ sym.map(x => true -> (x * 5)))
      .toDF("b", "m")
    val rs = TwoSampleRank.lepage(scale, col("b"), col("m"))
      .collect().head
    assert(math.abs(rs.getDouble(2)) < 0.2, "location z should be ~0")
    assert(rs.getBoolean(5), s"l=${rs.getDouble(4)}")
  }

  test("differential: lepage moments equal brute-force enumeration " +
    "on tied data") {
    // deterministic tie-heavy sample: values k % 7 in cohorts by k % 2
    val rows = (0 until 60).map(k => ((k % 2) == 1, (k % 7).toDouble))
    val r = TwoSampleRank.lepage(rows.toDF("b", "m"), col("b"),
      col("m")).collect().head
    // brute force: midranks by sorting, exact hypergeometric moments
    val xs = rows.map(_._2)
    val sorted = xs.sorted
    val midrank: Map[Double, Double] = xs.distinct.map { v =>
      val idx = sorted.zipWithIndex.filter(_._1 == v).map(_._2 + 1)
      v -> idx.sum.toDouble / idx.size
    }.toMap
    val n = xs.size.toDouble
    def moments(score: Double => Double) = {
      val all = xs.map(score)
      val b = rows.filter(_._1).map(x => score(x._2))
      val mean = all.sum / n
      val v = all.map(s => s * s).sum / n - mean * mean
      val t = b.sum
      val nb = b.size.toDouble
      (t - nb * mean) / math.sqrt(nb * (n - nb) / (n - 1) * v)
    }
    val zW = moments(v => midrank(v))
    val zA = moments(v => math.min(midrank(v), n + 1 - midrank(v)))
    assert(math.abs(r.getDouble(2) - zW) < 1e-6,
      s"z_w=${r.getDouble(2)} brute=$zW")
    assert(math.abs(r.getDouble(3) - zA) < 1e-6,
      s"z_a=${r.getDouble(3)} brute=$zA")
    assert(math.abs(r.getDouble(4) - (zW * zW + zA * zA)) < 1e-5)
  }

  test("differential: cucconi U/V equal brute-force rank sums " +
    "on tied data") {
    val rows = (0 until 50).map(k => ((k % 2) == 1, (k % 5).toDouble))
    val r = TwoSampleRank.cucconi(rows.toDF("b", "m"), col("b"),
      col("m")).collect().head
    val xs = rows.map(_._2)
    val sorted = xs.sorted
    val midrank: Map[Double, Double] = xs.distinct.map { v =>
      val idx = sorted.zipWithIndex.filter(_._1 == v).map(_._2 + 1)
      v -> idx.sum.toDouble / idx.size
    }.toMap
    val n = xs.size.toDouble
    val bR = rows.filter(_._1).map(x => midrank(x._2))
    val nb = bR.size.toDouble; val na = n - nb
    val s2 = bR.map(x => x * x).sum
    val s2c = bR.map(x => (n + 1 - x) * (n + 1 - x)).sum
    val den = math.sqrt(na * nb * (n + 1) * (2 * n + 1) *
      (8 * n + 11) / 5)
    val u = (6 * s2 - nb * (n + 1) * (2 * n + 1)) / den
    val v = (6 * s2c - nb * (n + 1) * (2 * n + 1)) / den
    assert(math.abs(r.getDouble(2) - u) < 1e-6,
      s"u=${r.getDouble(2)} brute=$u")
    assert(math.abs(r.getDouble(3) - v) < 1e-6,
      s"v=${r.getDouble(3)} brute=$v")
  }

  test("conover squared ranks: symmetric deviations give the exact null") {
    // A = {1,3,5} (mean 3, |dev| {2,0,2}), B = {2,4,6} (mean 4,
    // |dev| {2,0,2}): identical deviation multisets → T = E[T]
    val r = TwoSampleRank.conoverSquaredRanks(interleaved,
      col("b"), col("m")).collect().head
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-9)   // t_ratio = 1
    assert(math.abs(r.getDouble(3)) < 1e-9 && !r.getBoolean(4))
    // a genuine spread change rejects even with equal means
    val sym = (-100 to 100).map(_.toDouble / 10)
    val scale = (sym.map(false -> _) ++ sym.map(x => true -> (x * 4)))
      .toDF("b", "m")
    val rs = TwoSampleRank.conoverSquaredRanks(scale,
      col("b"), col("m")).collect().head
    assert(rs.getBoolean(4) && rs.getDouble(2) > 1.0,
      s"ratio=${rs.getDouble(2)} z=${rs.getDouble(3)}")
    // and a pure location shift does NOT (deviations unchanged)
    val shift = (sym.map(false -> _) ++ sym.map(x => true -> (x + 50)))
      .toDF("b", "m")
    val rl = TwoSampleRank.conoverSquaredRanks(shift,
      col("b"), col("m")).collect().head
    assert(!rl.getBoolean(4), s"z=${rl.getDouble(3)}")
  }

  /** Independent BWS computation: explicit ordered-rank double loop
    * over a materialized sample, same tie conventions. */
  private def bruteBws(
      xs: Seq[(Boolean, Double, Long)]): (Double, Double) = {
    val ranked = xs.sortBy(t => (t._2, t._1, t._3)).zipWithIndex
      .map { case ((b, x, k), idx) => (b, x, k, idx + 1.0) }
    def side(flag: Boolean): Double = {
      val own = ranked.filter(_._1 == flag)
        .sortBy(t => (t._2, t._3)).zipWithIndex
        .map { case ((_, _, _, r), i0) => (r, i0 + 1.0) }
      val n = own.size.toDouble
      val m = ranked.size - n
      val nt = n + m
      own.map { case (r, i) =>
        val d = r - nt / n * i
        val f = i / (n + 1.0)
        d * d / (f * (1.0 - f) * m * nt / n)
      }.sum / n
    }
    (side(false), side(true))
  }

  test("bws agrees with a brute ordered-rank computation and gates sanely") {
    // deterministic uneven panel: 30 vs 23 observations, values from
    // two different deterministic sequences with a mild shift
    val xs = (0 until 30).map(i =>
      (false, math.sin(i * 1.3) * 10 + i * 0.7, i.toLong)) ++
      (0 until 23).map(i =>
        (true, math.cos(i * 1.7) * 10 + i * 0.9 + 2.0, (100 + i).toLong))
    val (ba, bb) = bruteBws(xs)
    val r = TwoSampleRank.bws(xs.toDF("b", "m", "k"),
      col("b"), col("m"), col("k")).collect().head
    assert(r.getLong(0) == 30L && r.getLong(1) == 23L)
    assert(math.abs(r.getDouble(2) - ba) < 1.1e-6, s"b_a $ba")
    assert(math.abs(r.getDouble(3) - bb) < 1.1e-6, s"b_b $bb")
    assert(math.abs(r.getDouble(4) - (ba + bb) / 2) < 1.1e-6)
    // complete separation: B far above the 2.493 asymptotic 5% point
    val sep = ((1 to 50).map(i => (false, i.toDouble, i.toLong)) ++
      (1 to 50).map(i => (true, i + 100.0, (200 + i).toLong)))
      .toDF("b", "m", "k")
    val rs = TwoSampleRank.bws(sep, col("b"), col("m"), col("k"))
      .collect().head
    assert(rs.getBoolean(5), s"separated B=${rs.getDouble(4)}")
    // identical samples interleaved: B stays near its null mean ~1
    val same = ((1 to 50).map(i => (false, i * 2.0, i.toLong)) ++
      (1 to 50).map(i => (true, i * 2.0 + 1.0, (200 + i).toLong)))
      .toDF("b", "m", "k")
    val rn = TwoSampleRank.bws(same, col("b"), col("m"), col("k"))
      .collect().head
    assert(!rn.getBoolean(5), s"null-ish B=${rn.getDouble(4)}")
  }
}
