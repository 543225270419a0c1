package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.ClassifierEval

class ClassifierEvalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def auc(rows: Seq[(Double, Boolean)]): Double =
    ClassifierEval.aucSummary(rows.toDF("score", "label"), "score", "label")
      .select("auc").as[Double].collect().head

  test("perfect separation is 1.0; inverted is 0.0; constant score is 0.5") {
    val sep = Seq((0.9, true), (0.8, true), (0.2, false), (0.1, false))
    assert(auc(sep) == 1.0)
    assert(auc(sep.map { case (s, l) => (s, !l) }) == 0.0)
    assert(auc(Seq((0.5, true), (0.5, false), (0.5, true))) == 0.5)
  }

  test("tied-pair correction: hand-computed Mann–Whitney with ties") {
    // pos {0.8, 0.6}, neg {0.6, 0.4}: 3 wins + 1 tie of 4 pairs
    val rows = Seq((0.8, true), (0.6, true), (0.6, false), (0.4, false))
    assert(auc(rows) == 0.875)
  }

  test("degenerate single-class corpus reports 0.5, not NaN") {
    assert(auc(Seq((0.9, true), (0.1, true))) == 0.5)
    assert(auc(Seq((0.9, false), (0.1, false))) == 0.5)
  }

  test("matches brute-force pairwise probability on a mixed corpus") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 300).map { _ =>
      val l = rnd.nextBoolean()
      // positives shifted up but overlapping, scores discretized
      val s = math.rint(((if (l) 0.3 else 0.0) + rnd.nextDouble()) * 20) / 20
      (s, l)
    }
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val wins = (for (p <- pos; n <- neg) yield
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val brute = BigDecimal(wins / (pos.size.toDouble * neg.size))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(auc(rows) == brute)
  }

  test("roc curve: monotone, ends at (1,1), trapezoid sum re-derives auc") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 200).map { _ =>
      val l = rnd.nextBoolean()
      (math.rint(((if (l) 0.4 else 0.0) + rnd.nextDouble()) * 10) / 10, l)
    }
    val curve = ClassifierEval.rocCurve(rows.toDF("score", "label"),
      "score", "label")
      .select("fpr", "tpr").as[(Double, Double)].collect()
    assert(curve.last == ((1.0, 1.0)))
    assert(curve.sliding(2).forall {
      case Array((f1, t1), (f2, t2)) => f2 >= f1 && t2 >= t1
      case _ => true
    })
    // trapezoid area under (fpr, tpr), from the (0,0) origin
    val pts = ((0.0, 0.0)) +: curve.toSeq
    val area = pts.sliding(2).map {
      case Seq((f1, t1), (f2, t2)) => (f2 - f1) * (t1 + t2) / 2.0
    }.sum
    val a = auc(rows)
    assert(math.abs(area - a) < 1e-4)  // both rounded to 6 decimals
  }

  test("average precision: hand case, perfect ranking, no positives") {
    def ap(rows: Seq[(Double, Boolean)]) =
      ClassifierEval.averagePrecision(rows.toDF("score", "label"),
        "score", "label").collect().head
    // pos@0.9 (prec 1), neg@0.8, pos@0.7 (prec 2/3):
    // AP = ½·1 + ½·⅔ = 5/6
    val r = ap(Seq((0.9, true), (0.8, false), (0.7, true)))
    assert(r.getLong(0) == 2L && r.getLong(1) == 1L && r.getLong(2) == 3L)
    assert(math.abs(r.getDouble(3) - 5.0 / 6.0) < 1e-6)
    // every positive above every negative → AP = 1
    val perfect = ap(Seq((0.9, true), (0.8, true), (0.2, false)))
    assert(perfect.getDouble(3) == 1.0)
    // all-negative corpus → NULL, not NaN
    assert(ap(Seq((0.9, false), (0.1, false))).isNullAt(3))
  }
}
