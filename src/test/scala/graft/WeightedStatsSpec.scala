package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Concentration, Sampling}

/** Kish ESS bounds and hand values, mass-weighted quantile picking
  * (tie-safe), and the Hill estimator on a planted Pareto tail. */
class WeightedStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: Seq[(Long, String, Long)]) =
    rows.map { case (id, lang, n) => (id, "x", lang, "src0", n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("ESS: equal weights give ESS = n, one giant gives ESS → 1") {
    val d = docs(
      (1 to 10).map(i => (i.toLong, "eq", 100L)) ++
      Seq((11L, "sk", 10000L)) ++ (12 to 20).map(i => (i.toLong, "sk", 1L)))
    val got = Sampling.effectiveSampleSize(d, "lang", "n_chars")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(3), r.getDouble(4)))).toMap
    val (nEq, essEq, ratioEq) = got("eq")
    assert(nEq == 10L && math.abs(essEq - 10.0) < 1e-9 &&
      math.abs(ratioEq - 1.0) < 1e-9)
    val (nSk, essSk, _) = got("sk")
    assert(nSk == 10L && essSk < 1.01,
      s"one giant doc must collapse ESS to ~1, got $essSk")
  }

  test("ESS is always within (0, n]") {
    val d = docs((1 to 60).map(i =>
      (i.toLong, s"l${i % 3}", (i * i % 37 + 1).toLong)))
    Sampling.effectiveSampleSize(d, "lang", "n_chars").collect()
      .foreach { r =>
        assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= r.getLong(1) + 1e-9)
      }
  }

  test("weighted quantiles: hand case with ties and skew") {
    // lang a: values 1,1,1,1,96 weighted by themselves → total 100;
    // cum at v=1 is 4 (<25) so wp25..wp75 all land on 96
    // lang b: values 10,10,20,60 → total 100; cum(10)=20, cum(20)=40,
    // cum(60)=100 → wp25=20 (cum 40 ≥ 25), wp50=60 (first cum ≥ 50),
    // wp75=60
    val d = docs(Seq(
      (1L, "a", 1L), (2L, "a", 1L), (3L, "a", 1L), (4L, "a", 1L),
      (5L, "a", 96L),
      (6L, "b", 10L), (7L, "b", 10L), (8L, "b", 20L), (9L, "b", 60L)))
    val got = Sampling.weightedQuantiles(d, "lang", "n_chars", "n_chars")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got("a") == ((100L, 96L, 96L, 96L)))
    assert(got("b") == ((100L, 20L, 60L, 60L)))
  }

  test("weighted median sits at half the MASS, not half the docs") {
    // 99 docs of length 1 + one of length 1000: unweighted median 1,
    // mass-weighted median 1000 (the giant holds 91% of tokens)
    val d = docs((1 to 99).map(i => (i.toLong, "a", 1L)) :+
      (100L, "a", 1000L))
    val r = Sampling.weightedQuantiles(d, "lang", "n_chars", "n_chars")
      .collect().head
    assert(r.getLong(4) == 1000L, "wp50 must follow the mass")
  }

  test("Hill estimator recovers a planted Pareto tail index") {
    // exact Pareto(α=2) quantiles: x_i = (n/i)^(1/2); Hill over the
    // top k=100 of n=5000 should estimate α within ~25%
    val n = 5000
    val xs = (1 to n).map(i =>
      (i.toLong, math.pow(n.toDouble / i, 0.5)))
    val df = xs.toDF("id", "v")
    val r = Concentration.hillTailIndex(df, "v", k = 100).collect().head
    assert(r.getLong(0) == 100L)
    val alpha = r.getDouble(2)
    assert(alpha > 1.5 && alpha < 2.5,
      s"planted α=2, estimated $alpha")
  }

  test("Hill: heavier tail (smaller α) estimates smaller") {
    val n = 3000
    def mk(a: Double) = (1 to n).map(i =>
      math.pow(n.toDouble / i, 1.0 / a))
    val h1 = Concentration.hillTailIndex(
      mk(1.0).zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v"), "v", k = 80).collect().head.getDouble(2)
    val h3 = Concentration.hillTailIndex(
      mk(3.0).zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v"), "v", k = 80).collect().head.getDouble(2)
    assert(h1 < h3, "α̂ must order with the true tail index")
  }
}
