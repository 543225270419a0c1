package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Experiment, Homogeneity, Normality, Reliability}

/** Planted-case semantics for the r12 monitor-adjacent wave: Mood's
  * median, Cohen's h, Jarque-Bera, and the streaming Cronbach fold's
  * stream ≡ batch equivalence. */
class NormalitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("mood median: a shifted group is flagged, equal locations are not") {
    def grp(g: String, center: Double) =
      (0 until 90).map(i => (g, center + (i % 21 - 10) / 2.0))
    val shifted = (grp("a", 10.0) ++ grp("b", 18.0)).toDF("g", "x")
    val equal = (grp("a", 10.0) ++ grp("b", 10.0)).toDF("g", "x")
    val rS = Homogeneity.moodMedian(shifted, col("g"), col("x"))
      .collect()(0)
    val rE = Homogeneity.moodMedian(equal, col("g"), col("x"))
      .collect()(0)
    assert(rS.getBoolean(5), s"shifted chi2=${rS.getDouble(3)}")
    assert(!rE.getBoolean(5), s"equal chi2=${rE.getDouble(3)}")
    assert(rS.getLong(1) == 2L && rS.getLong(0) == 180L)
  }

  test("cohens h: 1% vs 2% reads bigger than 50% vs 51%") {
    def units(pa: Int, pb: Int) = (0 until 2000).map { i =>
      val b = i % 2 == 1
      (b, if (b) (i / 2) % 100 < pb else (i / 2) % 100 < pa)
    }
    val rare = Experiment.cohensH(units(1, 2).toDF("b", "s"),
      col("b"), col("s")).collect()(0)
    val mid = Experiment.cohensH(units(50, 51).toDF("b", "s"),
      col("b"), col("s")).collect()(0)
    assert(math.abs(rare.getDouble(6)) >
      math.abs(mid.getDouble(6)) * 3,
      s"rare=${rare.getDouble(6)} mid=${mid.getDouble(6)}")
  }

  test("jarque-bera: a symmetric flat sample is flagged vs a near-normal one") {
    // triangular-ish (sum of two uniforms) ~ near-normal tails at
    // this n; pure uniform is platykurtic (K ~ 1.8) and JB flags it
    def u(i: Int, s: Int) = {
      var v = i.toLong * 2654435761L + s * -7046029254386353131L
      v ^= v >>> 13; v *= 1274126177L; v ^= v >>> 16
      (((v % 1000L) + 1000L) % 1000L) / 1000.0
    }
    val uniform = (0 until 3000).map(i => u(i, 1)).toDF("x")
    val sum12 = (0 until 3000)
      .map(i => (0 until 12).map(s => u(i, s)).sum - 6.0).toDF("x")
    val rU = Normality.jarqueBera(uniform, col("x")).collect()(0)
    val rN = Normality.jarqueBera(sum12, col("x")).collect()(0)
    assert(rU.getBoolean(5), s"uniform jb=${rU.getDouble(4)}")
    assert(rU.getDouble(3) < 2.2, s"uniform K=${rU.getDouble(3)}")
    assert(rN.getDouble(4) < rU.getDouble(4),
      s"sum12 jb=${rN.getDouble(4)} uniform jb=${rU.getDouble(4)}")
  }

  test("lilliefors: uniform data is far from normal, sum-of-12 is close") {
    def u(i: Int, s: Int) = {
      var v = i.toLong * 2654435761L + s * -7046029254386353131L
      v ^= v >>> 13; v *= 1274126177L; v ^= v >>> 16
      (((v % 1000L) + 1000L) % 1000L) / 1000.0
    }
    val uniform = (0 until 2000).map(i => u(i, 1)).toDF("x")
    val sum12 = (0 until 2000)
      .map(i => (0 until 12).map(s => u(i, s)).sum - 6.0).toDF("x")
    val rU = Normality.lilliefors(uniform, col("x")).collect()(0)
    val rN = Normality.lilliefors(sum12, col("x")).collect()(0)
    assert(rU.getBoolean(5), s"uniform D=${rU.getDouble(3)}")
    assert(rN.getDouble(3) < rU.getDouble(3) / 2,
      s"sum12 D=${rN.getDouble(3)} uniform D=${rU.getDouble(3)}")
  }

  test("cohens d: a one-pooled-sd shift reads d ~ 1") {
    def units(shift: Double) = (0 until 800).map { i =>
      val noise = (i % 41 - 20) / 20.0 * 1.732   // sd ~ 1
      (i % 2 == 1, 10.0 + noise + (if (i % 2 == 1) shift else 0.0))
    }
    val d1 = Experiment.cohensD(units(1.0).toDF("b", "m"),
      col("b"), col("m")).collect()(0)
    val d0 = Experiment.cohensD(units(0.0).toDF("b", "m"),
      col("b"), col("m")).collect()(0)
    assert(math.abs(d1.getDouble(5) - 1.0) < 0.1,
      s"d=${d1.getDouble(5)}")
    assert(d1.getString(7) == "large")
    assert(d0.getString(7) == "negligible")
    // Hedges g only shrinks
    assert(math.abs(d1.getDouble(6)) <=
      math.abs(d1.getDouble(5)) + 1e-12)
  }

  test("stream cronbach: two-batch fold equals the batch statistic") {
    val rows = (0 until 120).flatMap { u =>
      Seq("a", "b", "c").flatMap(it =>
        (0 to (u * (it.length + 1)) % 5).map(j =>
          (u.toLong, it, j.toLong)))
    }
    val ev = rows.toDF("user_id", "event_type", "j")
    val batch = Reliability.cronbachAlpha(ev, col("user_id"),
      col("event_type")).collect()(0)
    val root = graft.util.TempDirs.create("graft_cronbach_spec")
    val path = root.resolve("m").toString
    val (b1, b2) = (ev.filter(col("j") % 2 === 0),
      ev.filter(col("j") % 2 === 1))
    graft.streaming.EngagementMatrix.ingestOnce(spark, b1, path, 0L)
    graft.streaming.EngagementMatrix.ingestOnce(spark, b2, path, 1L)
    // replayed batch folds nothing twice
    assert(graft.streaming.EngagementMatrix
      .ingestOnce(spark, b2, path, 1L) == 0L)
    val stream = graft.streaming.EngagementMatrix
      .dashboard(spark, path).collect()(0)
    assert(stream.getLong(0) == batch.getLong(0))
    assert(stream.getDouble(4) == batch.getDouble(4),
      s"stream=${stream.getDouble(4)} batch=${batch.getDouble(4)}")
  }
}
