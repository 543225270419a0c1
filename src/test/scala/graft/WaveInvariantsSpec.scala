package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{CausalPanel, CoxPh, Dimensionality, ExactTests,
  Homogeneity, PairedTests, TimeWarp}

/** Algebraic invariants of the r12 wave — the properties that hold
  * for EVERY input, complementing the planted-case specs: tail
  * identities (Fisher), range/complement laws (JT, Wilcoxon, PR),
  * symmetry (DTW, Cox arm swap), single-stratum degeneracy (MH). */
class WaveInvariantsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(day: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(2024, 1, day).atStartOfDay)

  test("fisher: p_left + p_right = 1 + p_obs; two-sided bounded by both") {
    val rows = (0 until 60).map(i => (i % 3 == 0, i % 5 < 2))
    val r = ExactTests.fisherExact(rows.toDF("a", "b"),
      col("a"), col("b")).collect()(0)
    val (po, pl, pr, p2) = (r.getDouble(5), r.getDouble(6),
      r.getDouble(7), r.getDouble(8))
    assert(math.abs(pl + pr - 1.0 - po) < 1e-5,
      s"pl=$pl pr=$pr po=$po")
    assert(p2 >= po - 1e-9 && p2 <= 1.0 + 1e-9)
    assert(p2 >= math.min(pl, pr) - 1e-9)
  }

  test("dtw: self-distance is zero and the metric is symmetric") {
    val rows = (1 to 10).flatMap { d =>
      val n = 1 + (d * 7) % 5
      (0 until n).flatMap(i => Seq(
        (ts(d), "view", (d * 100 + i).toLong),
        (ts(d), "click", (d * 1000 + i).toLong)))
    } ++ (1 to 10).flatMap(d =>
      (0 until 1 + (d * 3) % 4).map(i =>
        (ts(d), "purchase", (d * 10000 + i).toLong)))
    val ev = rows.toDF("ts", "event_type", "event_id")
    val self = TimeWarp.dtwDaily(ev, "view", "click", band = 4)
      .collect()(0).getLong(2)
    assert(self == 0L, s"identical series dtw=$self")
    val ab = TimeWarp.dtwDaily(ev, "view", "purchase", band = 4)
      .collect()(0).getLong(2)
    val ba = TimeWarp.dtwDaily(ev, "purchase", "view", band = 4)
      .collect()(0).getLong(2)
    assert(ab == ba, s"asymmetric: $ab vs $ba")
  }

  test("jonckheere: JT and its group-reversal sum to the pair total") {
    def band(g: Int, base: Int, n: Int) =
      (0 until n).map(i => (g, (base + i % 4).toLong))
    val df = (band(0, 1, 30) ++ band(1, 2, 40) ++ band(2, 4, 20))
      .toDF("g", "v")
    val fwd = Homogeneity.jonckheere(df, col("g"), col("v"))
      .collect()(0).getDouble(2)
    val rev = Homogeneity.jonckheere(df, lit(2) - col("g"), col("v"))
      .collect()(0).getDouble(2)
    val pairTotal = 30.0 * 40 + 30.0 * 20 + 40.0 * 20
    assert(math.abs(fwd + rev - pairTotal) < 1e-6,
      s"fwd=$fwd rev=$rev total=$pairTotal")
  }

  test("wilcoxon: all-positive differences saturate w_plus") {
    val rows = (0 until 25).flatMap { u =>
      Seq((u.toLong, ts(1), 0L)) ++
        (0 to u % 4 + 1).map(j => (u.toLong, ts(9), j.toLong + 1))
    }.map { case (u, t, e) => (e, t, u) }
    val r = PairedTests.signedRankHalves(
      rows.toDF("event_id", "ts", "user_id")).collect()(0)
    val m = (r.getLong(2) + r.getLong(3)).toDouble
    assert(r.getDouble(4) == m * (m + 1.0) / 2.0,
      s"w_plus=${r.getDouble(4)} expect ${m * (m + 1) / 2}")
  }

  test("participation ratio stays within [1, d]") {
    val dfs = Seq(2, 7).map { seed =>
      (0L until 150L).map { i =>
        var v = i * 2654435761L + seed * -7046029254386353131L
        v ^= v >>> 13; v *= 1274126177L; v ^= v >>> 16
        val a = Array.tabulate(5) { d =>
          var w = v + d * 40503L
          w ^= w >>> 11; w *= 2654435761L
          ((((w % 100L) + 100L) % 100L).toFloat / 100f) *
            (d + 1).toFloat
        }
        (i, a)
      }.toDF("vec_id", "embedding")
    }
    dfs.foreach { df =>
      val pr = Dimensionality.participationRatio(df)
        .collect()(0).getDouble(3)
      assert(pr >= 1.0 - 1e-6 && pr <= 5.0 + 1e-6, s"pr=$pr")
    }
  }

  test("cox: swapping the arms flips the sign of beta") {
    val rows = (0 until 120).flatMap { u =>
      val d = if (u % 2 == 1) 2 + u % 3 else 5 + u % 4
      Seq((u.toLong, ts(1), "view"), (u.toLong, ts(d), "purchase"))
    }
    val ev = rows.toDF("user_id", "ts", "event_type")
    val b1 = CoxPh.fit(ev).collect()(0).getDouble(3)
    val swapped = ev.withColumn("user_id", col("user_id") + 1)
    val b2 = CoxPh.fit(swapped).collect()(0).getDouble(3)
    assert(math.abs(b1 + b2) < 1e-5, s"b1=$b1 b2=$b2")
  }

  test("mantel-haenszel: one stratum degenerates to the plain OR") {
    val rows = (0 until 50).map(i => ("only", i % 2 == 1,
      if (i % 2 == 1) i % 4 < 2 else i % 5 < 1))
    val df = rows.toDF("s", "t", "y")
    val r = CausalPanel.mantelHaenszel(df, col("s"), col("t"),
      col("y")).collect()(0)
    val cells = df.groupBy().agg(
      sum(when(col("t") && col("y"), 1L)).as("a"),
      sum(when(col("t") && !col("y"), 1L)).as("b"),
      sum(when(!col("t") && col("y"), 1L)).as("c"),
      sum(when(!col("t") && !col("y"), 1L)).as("d")).collect()(0)
    val plain = cells.getLong(0).toDouble * cells.getLong(3) /
      (cells.getLong(1).toDouble * cells.getLong(2))
    assert(math.abs(r.getDouble(2) - plain) < 1e-6,
      s"mh=${r.getDouble(2)} plain=$plain")
  }

  test("hubness: occurrence mass is conserved at k per query") {
    val pts = (0L until 40L).map { i =>
      val a = Array.fill(8)(0.01f * ((i % 7) + 1))
      a((i % 8L).toInt) = 1.0f
      (i, a)
    }.toDF("vec_id", "embedding")
    val r = Dimensionality.hubness(pts, k = 4, queryMod = 3)
      .collect()(0)
    val totalOcc = r.getDouble(3) * r.getLong(2)
    assert(math.abs(totalOcc - 4.0 * r.getLong(1)) < 1e-3,
      s"sum occ=$totalOcc queries=${r.getLong(1)}")
  }
}
