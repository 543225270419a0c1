package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Bootstrap

class BootstrapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ci(vals: Seq[Double], b: Int = 32, alpha: Double = 0.05) =
    Bootstrap.meanCi(
      vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v"),
      "id", "v", b, alpha)
      .select("n_rows", "n_replicates", "est", "boot_mean", "se",
        "ci_lo", "ci_hi")
      .as[(Long, Long, Double, Double, Double, Double, Double)]
      .collect().head

  test("interval brackets the point estimate; se shrinks with n") {
    val rnd = new scala.util.Random(41)
    val small = (1 to 200).map(_ => 50.0 + rnd.nextGaussian() * 10)
    val large = small ++ (1 to 3000).map(_ => 50.0 + rnd.nextGaussian() * 10)
    val s = ci(small)
    val l = ci(large)
    Seq(s, l).foreach { r =>
      assert(r._6 <= r._3 && r._3 <= r._7,
        s"CI [${r._6}, ${r._7}] must bracket est ${r._3}")
      assert(r._5 > 0.0)
    }
    assert(l._5 < s._5, s"se must shrink with n: ${l._5} vs ${s._5}")
  }

  test("constant data gives a zero-width interval at the constant") {
    val r = ci(Seq.fill(500)(7.0))
    assert(r._3 == 7.0 && r._4 == 7.0 && r._5 == 0.0)
    assert(r._6 == 7.0 && r._7 == 7.0)
  }

  test("deterministic across runs (hash-seeded weights)") {
    val vals = (1 to 300).map(_.toDouble)
    assert(ci(vals) == ci(vals))
  }

  test("se approximates sd/sqrt(n) on well-behaved data") {
    val rnd = new scala.util.Random(43)
    val vals = (1 to 4000).map(_ => rnd.nextGaussian() * 20 + 100)
    val r = ci(vals, b = 64)
    val sd = {
      val m = vals.sum / vals.size
      math.sqrt(vals.map(v => (v - m) * (v - m)).sum / (vals.size - 1))
    }
    val theory = sd / math.sqrt(vals.size.toDouble)
    assert(r._5 > theory * 0.6 && r._5 < theory * 1.6,
      s"bootstrap se ${r._5} vs theoretical $theory")
  }
}
