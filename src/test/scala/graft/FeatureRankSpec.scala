package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{FeatureRank, Homogeneity, Sampling}
import graft.quality.Dependencies

/** Planted-case semantics for the categorical-audit wave: gain-ratio
  * feature ranking, Cramér's V, Bartlett variance test, balanced
  * class downsampling. */
class FeatureRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("gain ratio: a label-copy feature scores 1, a constant scores null") {
    val df = (0 until 120).map { i =>
      val lbl = if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr"
      (lbl, lbl, "const", if (i % 2 == 0) "a" else "b")
    }.toDF("lang", "copy_f", "const_f", "coin_f")
    val r = FeatureRank.gainRatio(df, col("lang"), Seq(
      ("a_copy", col("copy_f")),
      ("b_const", col("const_f")),
      ("c_coin", col("coin_f"))))
      .collect().map(x => x.getString(0) -> x).toMap
    // copy: IG = H(label), gain ratio exactly 1
    assert(math.abs(r("a_copy").getDouble(5) - 1.0) < 1e-6)
    assert(math.abs(r("a_copy").getDouble(3) -
      r("a_copy").getDouble(2)) < 1e-6)
    // constant: split info 0 -> null ratio
    assert(r("b_const").isNullAt(5))
    // independent coin: IG ~ 0
    assert(r("c_coin").getDouble(3) < 0.01,
      s"coin ig=${r("c_coin").getDouble(3)}")
  }

  test("cramers v: determined pair reads 1, independent pair reads ~0") {
    val dep = (0 until 200).map { i =>
      val a = s"a${i % 4}"; (a, a.toUpperCase)
    }.toDF("x", "y")
    val ind = (0 until 200).map { i =>
      (s"a${i % 4}", s"b${(i / 4) % 5}")
    }.toDF("x", "y")
    val vDep = Dependencies.cramersV(dep, col("x"), col("y"))
      .collect()(0)
    val vInd = Dependencies.cramersV(ind, col("x"), col("y"))
      .collect()(0)
    assert(math.abs(vDep.getDouble(4) - 1.0) < 1e-6)
    assert(vInd.getDouble(4) < 0.05, s"ind V=${vInd.getDouble(4)}")
    // bias correction only shrinks
    assert(vDep.getDouble(5) <= vDep.getDouble(4) + 1e-9)
  }

  test("bartlett: unequal variances flagged, equal not") {
    def grp(g: String, center: Double, spread: Double) =
      (0 until 80).map(i =>
        (g, center + spread * ((i % 21) - 10) / 10.0))
    val uneq = (grp("a", 100.0, 1.0) ++ grp("b", 100.0, 40.0))
      .toDF("g", "x")
    val eq = (grp("a", 100.0, 10.0) ++ grp("b", 300.0, 10.0))
      .toDF("g", "x")
    val rU = Homogeneity.bartlett(uneq, col("g"), col("x"))
      .collect()(0)
    val rE = Homogeneity.bartlett(eq, col("g"), col("x"))
      .collect()(0)
    assert(rU.getBoolean(5), s"unequal chi2=${rU.getDouble(3)}")
    assert(!rE.getBoolean(5), s"equal chi2=${rE.getDouble(3)}")
    assert(rU.getLong(4) == 1L)   // df = k - 1
  }

  test("bartlett: zero-variance and singleton groups are excluded") {
    val df = (Seq.tabulate(30)(i => ("a", 10.0 + (i % 7))) ++
      Seq.tabulate(10)(_ => ("zero", 5.0)) ++    // zero variance
      Seq(("single", 1.0)) ++                     // n = 1
      Seq.tabulate(30)(i => ("b", 50.0 + (i % 13) * 3.0)))
      .toDF("g", "x")
    val r = Homogeneity.bartlett(df, col("g"), col("x")).collect()(0)
    assert(r.getLong(1) == 2L, s"k=${r.getLong(1)}")
    assert(r.getLong(0) == 60L, s"n=${r.getLong(0)}")
  }

  test("balanced sample: every class kept at the minority size, first ids") {
    val df = (Seq.tabulate(5)(i => (i.toLong, "en", 100L)) ++
      Seq.tabulate(3)(i => (10L + i, "de", 200L)) ++
      Seq.tabulate(7)(i => (20L + i, "fr", 300L)))
      .toDF("doc_id", "lang", "n_chars")
    val r = Sampling.balancedByClass(df, "lang", "doc_id", "n_chars")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r.keySet == Set("en", "de", "fr"))
    assert(r.values.forall(_.getLong(2) == 3L))
    // en keeps ids 0,1,2 -> checksum 3; fr keeps 20,21,22 -> 63
    assert(r("en").getLong(3) == 3L)
    assert(r("fr").getLong(3) == 63L)
    assert(r("de").getLong(1) == 3L && r("de").getLong(3) == 33L)
  }
}
