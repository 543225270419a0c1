package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{ClassifierEval, ClusterQuality}

class PartitionAgreementSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("identical partitions read rand = ari = fm = 1") {
    val df = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"),
      ("c", "z"), ("c", "z")).toDF("l1", "l2")
    val r = ClusterQuality.partitionAgreement(df, col("l1"), col("l2"))
      .collect().head
    assert(r.getLong(0) == 6L && r.getLong(1) == 3L && r.getLong(2) == 3L)
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 1.0 &&
      r.getDouble(5) == 1.0)
  }

  test("ari replays the textbook Hubert-Arabie worked example") {
    // contingency [[1,1,0],[1,2,1],[0,0,4]] over n = 10:
    // TP = 0+0+0+0+1+0+0+0+6 = 7; rows C(2,2)+C(4,2)+C(4,2) = 13;
    // cols C(2,2)+C(3,2)+C(5,2) = 14; total = 45
    // exp = 13*14/45; ari = (7-exp)/((13+14)/2-exp)
    val rows =
      Seq((1, 1), (1, 2)) ++
      Seq((2, 1)) ++ Seq.fill(2)((2, 2)) ++ Seq((2, 3)) ++
      Seq.fill(4)((3, 3))
    val r = ClusterQuality.partitionAgreement(rows.toDF("a", "b"),
      col("a"), col("b")).collect().head
    val exp = 13.0 * 14 / 45
    val ari = (7 - exp) / ((13 + 14) / 2.0 - exp)
    assert(math.abs(r.getDouble(4) - ari) < 1e-6,
      s"ari=${r.getDouble(4)} want $ari")
    // FM = TP/sqrt(a·b)
    assert(math.abs(r.getDouble(5) - 7.0 / math.sqrt(13.0 * 14)) < 1e-6)
    // Rand = (45 + 14 - 13 - 14)/45 = (45 - 13 - 14 + 2*7)/45
    assert(math.abs(r.getDouble(3) - (45.0 - 13 - 14 + 14) / 45) < 1e-6)
  }

  test("degenerate partitions: singletons-vs-lump is ARI 0, " +
    "both-constant is NULL") {
    // one lump vs all singletons: TP = 0 and E[TP] = 0, but the
    // normalizer is positive → ARI is a defined 0 (no agreement
    // beyond chance), FM undefined (no B-side pairs at all)
    val df = Seq(("a", "x"), ("a", "y"), ("a", "z")).toDF("l1", "l2")
    val r = ClusterQuality.partitionAgreement(df, col("l1"), col("l2"))
      .collect().head
    assert(r.getDouble(4) == 0.0 && r.isNullAt(5))
    // BOTH sides a single cluster: max agreement = chance agreement
    // → the ARI correction is 0/0 → NULL; FM = 1 (identical trivial
    // partitions)
    val both = Seq(("a", "x"), ("a", "x"), ("a", "x")).toDF("l1", "l2")
    val rb = ClusterQuality.partitionAgreement(both, col("l1"),
      col("l2")).collect().head
    assert(rb.isNullAt(4) && rb.getDouble(5) == 1.0 &&
      rb.getDouble(3) == 1.0)
  }

  test("mcc confusion replays a hand confusion and its degenerate") {
    // scores {0.9(+), 0.8(-), 0.4(+), 0.1(-)} at t=0.5:
    // tp=1 fp=1 fn=1 tn=1 → mcc = (1-1)/sqrt(16) = 0, f1 = 0.5,
    // balanced = 0.5, informedness = 0
    val df = Seq((0.9, true), (0.8, false), (0.4, true), (0.1, false))
      .toDF("score", "label")
    val r = ClassifierEval.confusionSummary(df, "score", "label", 0.5)
      .collect().head
    assert(r.getLong(0) == 1L && r.getLong(1) == 1L &&
      r.getLong(2) == 1L && r.getLong(3) == 1L)
    assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 0.5)
    assert(r.getDouble(6) == 0.5 && r.getDouble(7) == 0.0)
    // perfect classifier: mcc = f1 = 1, informedness = 1
    val perfect = Seq((0.9, true), (0.8, true), (0.1, false))
      .toDF("score", "label")
    val rp = ClassifierEval.confusionSummary(perfect, "score", "label",
      0.5).collect().head
    assert(rp.getDouble(4) == 1.0 && rp.getDouble(5) == 1.0 &&
      rp.getDouble(7) == 1.0)
    // constant classifier (all predicted positive): mcc undefined →
    // NULL; f1 still defined; informedness 0
    val const = Seq((0.9, true), (0.8, false)).toDF("score", "label")
    val rc = ClassifierEval.confusionSummary(const, "score", "label",
      0.5).collect().head
    assert(rc.isNullAt(4))
    assert(rc.getDouble(7) == 0.0)
  }

  test("fleiss kappa replays a hand-computed 3-item panel") {
    // m = 2 raters per item; items X:{a,a} Y:{a,b} Z:{b,b}
    // P_i = (Σn²−2)/2 → 1, 0, 1 → P̄ = 2/3
    // p_a = 3/6, p_b = 3/6 → Pe = 1/2 → κ = (2/3−1/2)/(1/2) = 1/3
    val df = Seq(("x", "a"), ("x", "a"), ("y", "a"), ("y", "b"),
      ("z", "b"), ("z", "b")).toDF("item", "cat")
    val r = graft.quality.Agreement.fleissKappa(df, col("item"),
      col("cat"), m = 2).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(math.abs(r.getDouble(3) - 2.0 / 3) < 1e-6)
    assert(math.abs(r.getDouble(4) - 0.5) < 1e-6)
    assert(math.abs(r.getDouble(5) - 1.0 / 3) < 1e-6)
    // incomplete items drop: an item with one rating is excluded
    val withPartial = df.union(Seq(("w", "a")).toDF("item", "cat"))
    val rp = graft.quality.Agreement.fleissKappa(withPartial,
      col("item"), col("cat"), m = 2).collect().head
    assert(rp.getLong(0) == 3L)
    assert(math.abs(rp.getDouble(5) - 1.0 / 3) < 1e-6)
    // all raters constant: Pe = 1 → NULL kappa
    val allSame = Seq(("x", "a"), ("x", "a"), ("y", "a"), ("y", "a"))
      .toDF("item", "cat")
    val rs = graft.quality.Agreement.fleissKappa(allSame, col("item"),
      col("cat"), m = 2).collect().head
    assert(rs.isNullAt(5))
  }

  test("krippendorff alpha replays a hand-computed variable-rater panel") {
    // A:{a,a,b} B:{a,a} C:{b,b,b,c} D:{c} (unpairable, drops)
    // agree: A (4+1−3)/2 = 1, B (4−2)/1 = 2, C (9+1−4)/3 = 2 → 5
    // n = 9, D_o = 1 − 5/9 = 4/9
    // n_a = 4, n_b = 4, n_c = 1 → D_e = 1 − 24/72 = 2/3
    // α = 1 − (4/9)/(2/3) = 1/3
    val df = Seq(("A", "a"), ("A", "a"), ("A", "b"),
      ("B", "a"), ("B", "a"),
      ("C", "b"), ("C", "b"), ("C", "b"), ("C", "c"),
      ("D", "c")).toDF("item", "cat")
    val r = graft.quality.Agreement.krippendorffAlpha(df,
      col("item"), col("cat")).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 9L &&
      r.getLong(2) == 3L)
    assert(math.abs(r.getDouble(3) - 4.0 / 9) < 1e-6)
    assert(math.abs(r.getDouble(4) - 2.0 / 3) < 1e-6)
    assert(math.abs(r.getDouble(5) - 1.0 / 3) < 1e-6)
    // perfect agreement across two categories: D_o = 0, α = 1
    val perfect = Seq(("x", "a"), ("x", "a"), ("y", "b"), ("y", "b"))
      .toDF("item", "cat")
    val rp = graft.quality.Agreement.krippendorffAlpha(perfect,
      col("item"), col("cat")).collect().head
    assert(rp.getDouble(3) == 0.0 && rp.getDouble(5) == 1.0)
    // a single category everywhere: D_e = 0 → NULL alpha
    val one = Seq(("x", "a"), ("x", "a"), ("y", "a"), ("y", "a"))
      .toDF("item", "cat")
    val ro = graft.quality.Agreement.krippendorffAlpha(one,
      col("item"), col("cat")).collect().head
    assert(ro.isNullAt(5))
  }

  test("krippendorff alpha agrees with a brute coincidence-matrix computation") {
    // deterministic pseudo-random panel: 40 items, 1..4 raters each
    val ratings = for {
      i <- 0 until 40
      j <- 0 to i % 4
    } yield (s"item$i", ("abcde" ((i * 7 + j * 13) % 5)).toString)
    // independent implementation: explicit o_ck coincidence matrix
    val byItem = ratings.groupBy(_._1).filter(_._2.size >= 2)
    val cats = byItem.values.flatten.map(_._2).toSeq
    val n = cats.size.toDouble
    val catSet = cats.distinct
    var diag = 0.0
    for ((_, rs) <- byItem) {
      val vs = rs.map(_._2)
      val mu = vs.size
      for (a <- vs.indices; b <- vs.indices if a != b && vs(a) == vs(b))
        diag += 1.0 / (mu - 1)
    }
    val dObs = 1.0 - diag / n
    val dExp = 1.0 - catSet.map(c => cats.count(_ == c).toDouble)
      .map(x => x * (x - 1.0)).sum / (n * (n - 1.0))
    val alpha = 1.0 - dObs / dExp
    val r = graft.quality.Agreement.krippendorffAlpha(
      ratings.toDF("item", "cat"), col("item"), col("cat"))
      .collect().head
    assert(r.getLong(0) == 30L, "items with >= 2 ratings")
    assert(r.getLong(1).toDouble == n)
    assert(math.abs(r.getDouble(3) - dObs) < 1.1e-6, s"d_obs $dObs")
    assert(math.abs(r.getDouble(4) - dExp) < 1.1e-6, s"d_exp $dExp")
    assert(math.abs(r.getDouble(5) - alpha) < 1.1e-6, s"alpha $alpha")
  }
}
