package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Drift

/** JS mix-divergence semantics: the [0, 1]-bit endpoints (identical /
  * disjoint distributions), a hand-computed mid case, and finiteness
  * for one-sided categories. */
class MixDivergenceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frame(cats: String*) = cats.toDF("lang")

  private def report(ref: Seq[String], cur: Seq[String]) =
    Drift.mixDivergence(frame(ref: _*), frame(cur: _*), "lang")
      .as[(String, Long, Long, Double, Double, Double, Double)]
      .collect().toSeq

  test("identical distributions score exactly 0 bits") {
    val r = report(Seq("a", "a", "b"), Seq("a", "a", "b"))
    assert(r.forall(_._7 == 0.0))
    assert(r.forall(_._6 == 0.0))
  }

  test("disjoint supports score exactly 1 bit, finitely") {
    val r = report(Seq("a", "a"), Seq("b", "b"))
    assert(r.map(_._1) == Seq("a", "b"))
    assert(r.forall(_._7 == 1.0)) // total repeats on every row
    assert(r.map(_._6) == Seq(0.5, 0.5))
    // one-sided shares land as 0, not null/∞
    assert(r.head._5 == 0.0 && r.last._4 == 0.0)
  }

  test("hand-computed mid case: P={a:.5,b:.5} vs Q={a:1}") {
    val r = report(Seq("a", "b"), Seq("a", "a"))
    val byCat = r.map(x => x._1 -> x).toMap
    assert(byCat("a")._6 == 0.061278)
    assert(byCat("b")._6 == 0.25)
    assert(r.forall(_._7 == 0.311278))
  }

  test("divergence is symmetric") {
    val ab = report(Seq("a", "a", "a", "b"), Seq("a", "b", "b", "b"))
    val ba = report(Seq("a", "b", "b", "b"), Seq("a", "a", "a", "b"))
    assert(ab.head._7 == ba.head._7)
    assert(ab.head._7 > 0.0 && ab.head._7 < 1.0)
  }
}
