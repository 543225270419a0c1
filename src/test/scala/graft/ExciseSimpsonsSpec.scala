package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{ClassifierEval, Decontaminate, Simpsons}
import graft.quality.{Agreement, Dependencies}

/** Planted span-excision and Simpson-reversal cases. */
class ExciseSimpsonsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("excise: exactly the covered span goes, overlaps merge, clean docs absent") {
    val bench = Seq((100L, "the secret answer is"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // one match at tokens 3..6 of 8 -> 4 removed
      (1L, "alpha beta gamma the secret answer is delta"),
      // two OVERLAPPING matches (positions 1 and 2 via repeated
      // 'the'): 'the secret answer is' at 1, then a shifted window
      (2L, "the secret answer is the secret answer is"),
      // no match -> must not appear
      (3L, "totally clean document with enough tokens here"))
      .toDF("doc_id", "text")
    val r = Decontaminate.exciseContaminated(corpus, bench, n = 4)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(!r.contains(3L), "clean doc not reported")
    val d1 = r(1L)
    assert(d1.getLong(1) == 8L && d1.getLong(2) == 1L)
    assert(d1.getLong(3) == 4L)
    assert(d1.getString(4) == "alpha beta gamma delta")
    val d2 = r(2L)
    // matches at starts 1 and 5 cover everything
    assert(d2.getLong(3) == 8L && d2.getString(4) == "")
  }

  test("youden: a clean separator's threshold sits at the boundary") {
    // scores: positives at >= 0.7, negatives at <= 0.3 -> perfect
    // separation; threshold = lowest positive score (ties to higher)
    val rows = (0 until 40).map { i =>
      val pos = i % 2 == 0
      (if (pos) 0.7 + (i % 5) * 0.05 else 0.1 + (i % 5) * 0.05, pos)
    }.toDF("score", "label")
    val r = ClassifierEval.youdenThreshold(rows, "score", "label")
      .collect()(0)
    assert(r.getDouble(4) == 1.0, "perfect separation: J = 1")
    assert(r.getDouble(0) == 0.7, s"threshold=${r.getDouble(0)}")
    assert(r.getDouble(1) == 1.0 && r.getDouble(2) == 0.0)
  }

  test("chi2 residuals: diagonal concentration shows signed cells") {
    // a and b mostly agree on the diagonal -> diagonal cells over-
    // represented (positive residual), off-diagonal under (negative)
    val rows = (0 until 90).map { i =>
      val a = s"g${i % 3}"
      val b = if (i % 10 < 8) a else s"g${(i + 1) % 3}"
      (a, b)
    }.toDF("a", "b")
    val r = Dependencies.chi2Residuals(rows, col("a"), col("b"))
      .collect().map(x => (x.getString(0), x.getString(1)) -> x).toMap
    assert(r.size == 9, "full 3x3 grid incl. the empty cells")
    (0 until 3).foreach { g =>
      assert(r((s"g$g", s"g$g")).getDouble(4) > 0, "diagonal over")
    }
    assert(r(("g0", "g2")).getLong(2) == 0L, "empty cell reported")
    assert(r(("g0", "g2")).getDouble(4) < 0, "empty cell under")
  }

  test("bland-altman: a constant offset is pure bias, zero spread") {
    // exactly-representable quarters: diff is bit-identical 0.25
    // everywhere, so sd is exactly 0 (0.01 steps leave FP residue
    // that lands "outside" zero-width limits)
    val rows = (0 until 50).map(i => (i * 0.25 + 0.25, i * 0.25))
      .toDF("a", "b")
    val r = Agreement.blandAltman(rows, col("a"), col("b"))
      .collect()(0)
    assert(math.abs(r.getDouble(1) - 0.25) < 1e-9, "bias = offset")
    assert(r.getDouble(2) == 0.0, "no spread")
    assert(r.getDouble(5) == 0.0, "nothing outside the limits")
  }

  test("cliffs delta: dominance saturates at 1, overlap shrinks it") {
    import graft.operators.Experiment
    // complete separation: every b-value above every a-value
    val sep = ((0 until 20).map(i => (false, i * 1.0)) ++
      (0 until 20).map(i => (true, 100.0 + i))).toDF("b", "m")
    val r1 = Experiment.cliffsDelta(sep, col("b"), col("m"))
      .collect()(0)
    assert(r1.getDouble(4) == 1.0 && r1.getString(5) == "large")
    // identical distributions: delta 0
    val same = ((0 until 20).map(i => (false, i * 1.0)) ++
      (0 until 20).map(i => (true, i * 1.0))).toDF("b", "m")
    val r2 = Experiment.cliffsDelta(same, col("b"), col("m"))
      .collect()(0)
    assert(r2.getDouble(4) == 0.0 && r2.getString(5) == "negligible")
  }

  test("hurst: a trending ramp reads persistent, alternation reads anti") {
    import graft.operators.Hurst
    def orders(xs: Seq[Double]) = xs.zipWithIndex.map { case (x, i) =>
      (java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2020, 1, 1).plusDays(i).atStartOfDay),
        x)
    }.toDF("o_orderdate", "o_totalprice")
    val sizes = Seq(4, 8, 16)
    // monotone ramp: cumulative deviations grow with block size -> H ~ 1
    val ramp = Hurst.rescaledRange(
      orders((0 until 128).map(_.toDouble * 10 + 100)), sizes)
      .collect()
    assert(ramp.length == 3)
    assert(ramp(0).getDouble(3) > 0.85, s"ramp H=${ramp(0).getDouble(3)}")
    // strict alternation: deviations cancel immediately -> H well
    // below the ramp (anti-persistent)
    val alt = Hurst.rescaledRange(
      orders((0 until 128).map(i => if (i % 2 == 0) 100.0 else 200.0)),
      sizes).collect()
    assert(alt(0).getDouble(3) < 0.3, s"alt H=${alt(0).getDouble(3)}")
  }

  test("simpsons: a planted composition reversal is flagged") {
    // stratum A: treated 90% vs control 80% (treated better)
    // stratum B: treated 30% vs control 20% (treated better)
    // but treated units concentrate in B, control in A ->
    // pooled treated rate < pooled control rate: the paradox
    def unit(s: String, t: Boolean, conv: Int, n: Int) =
      (0 until n).map(i => (s, t, if (i < conv) 1.0 else 0.0))
    val units = (
      unit("A", true, 9, 10) ++ unit("A", false, 80, 100) ++
      unit("B", true, 30, 100) ++ unit("B", false, 2, 10))
      .toDF("s", "t", "y")
    val r = Simpsons.audit(units, col("s"), col("t"), col("y"))
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("A").getDouble(5) > 0 && r("B").getDouble(5) > 0,
      "both strata favor treatment")
    assert(r("ALL").getDouble(5) < 0, "pooled favors control")
    assert(!r("A").getBoolean(6) && !r("B").getBoolean(6),
      "strata flagged as disagreeing")
    assert(r("ALL").getBoolean(6), "pooled agrees with itself")
  }
}
