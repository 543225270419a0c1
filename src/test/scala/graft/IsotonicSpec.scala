package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.QualityModel

/** PAVA isotonic calibration: monotone output, weighted-mean
  * preservation, no-op on already-monotone curves, and agreement with
  * a brute-force O(n²) reference fit. */
class IsotonicSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** rows: (score, label). */
  private def run(rows: Seq[(Double, Boolean)], nBins: Int = 10) =
    QualityModel.isotonicCalibration(
      rows.toDF("score", "label"), "score", "label", nBins)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))

  /** Brute-force PAVA reference over (weight, rate) bins. */
  private def refPava(bins: Seq[(Double, Double)]): Seq[Double] = {
    var pools = bins.map { case (w, r) => (w, r * w) }.toVector
    var changed = true
    while (changed) {
      changed = false
      val i = pools.indices.dropRight(1).find(i =>
        pools(i)._2 / pools(i)._1 > pools(i + 1)._2 / pools(i + 1)._1)
      i.foreach { j =>
        val merged = (pools(j)._1 + pools(j + 1)._1,
          pools(j)._2 + pools(j + 1)._2)
        pools = (pools.take(j) :+ merged) ++ pools.drop(j + 2)
        changed = true
      }
    }
    // expand back: weights identify how many original bins each pool ate
    val out = Seq.newBuilder[Double]
    var bi = 0
    pools.foreach { case (w, m) =>
      var acc = 0.0
      while (acc < w - 1e-9) { acc += bins(bi)._1; bi += 1
        out += m / w }
    }
    out.result()
  }

  test("violating bins pool; output is monotone and mean-preserving") {
    // bins ~ deciles of score: rates 0.2, 0.8, 0.4 → middle two pool
    val rows =
      (1 to 10).map(i => (0.05, i <= 2)) ++     // bin 1: rate .2
      (1 to 10).map(i => (0.15, i <= 8)) ++     // bin 2: rate .8
      (1 to 10).map(i => (0.25, i <= 4))        // bin 3: rate .4
    val got = run(rows)
    assert(got.length == 3)
    val iso = got.map(_._4)
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b },
      s"must be non-decreasing: ${iso.toSeq}")
    // bins 2,3 pooled to (8+4)/20 = 0.6; bin 1 stays 0.2
    assert(iso.toSeq == Seq(0.2, 0.6, 0.6))
    // weighted mean preserved
    val lhs = got.map(r => r._4 * r._2).sum
    val rhs = got.map(r => r._3 * r._2).sum
    assert(math.abs(lhs - rhs) < 1e-6)
  }

  test("already-monotone curve is untouched") {
    val rows =
      (1 to 10).map(i => (0.05, i <= 1)) ++
      (1 to 10).map(i => (0.45, i <= 5)) ++
      (1 to 10).map(i => (0.95, i <= 9))
    val got = run(rows)
    got.foreach { case (_, _, raw, iso) =>
      assert(math.abs(raw - iso) < 1e-9) }
  }

  test("association: perfect dependence gives V=1, U=1; independence gives 0") {
    import org.apache.spark.sql.functions.col
    // perfect: b == a on a balanced 2×2
    val perfect = (1 to 40).map(i => (i % 2, i % 2))
      .toDF("a", "b")
    val p = graft.quality.Dependencies.association(perfect,
      col("a"), col("b")).collect().head
    assert(math.abs(p.getDouble(4) - 1.0) < 1e-9, "Cramér's V = 1")
    assert(math.abs(p.getDouble(5) - 1.0) < 1e-9, "Theil's U = 1")
    // independence: every (a, b) cell equally filled
    val indep = (0 until 40).map(i => (i % 2, (i / 2) % 2))
      .toDF("a", "b")
    val q = graft.quality.Dependencies.association(indep,
      col("a"), col("b")).collect().head
    assert(math.abs(q.getDouble(3)) < 1e-9, "chi2 = 0")
    assert(math.abs(q.getDouble(4)) < 1e-9, "V = 0")
    assert(math.abs(q.getDouble(5)) < 1e-9, "U = 0")
    assert(q.getLong(0) == 40L && q.getLong(1) == 2L && q.getLong(2) == 2L)
  }

  test("matches the brute-force PAVA on a seeded zig-zag curve") {
    var s = 41L
    def next(m: Int) = { s = (s * 1103515245L + 12345L) & 0x7fffffffL
      (s % m).toInt }
    val rows = (0 until 8).flatMap { b =>
      val n = next(12) + 3
      val pos = next(n + 1)
      (1 to n).map(i => (b / 8.0 + 0.05, i <= pos))
    }
    val got = run(rows, nBins = 8)
    val binsRef = got.map(r => (r._2.toDouble, r._3))
    val ref = refPava(binsRef).map(v => BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got.map(_._4).toSeq == ref.toSeq,
      s"engine ${got.map(_._4).toSeq} vs reference $ref")
  }
}
