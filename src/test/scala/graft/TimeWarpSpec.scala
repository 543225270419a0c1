package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Reliability, TimeWarp}
import graft.operators.Experiment
import graft.quality.Correlation

/** Planted-case semantics for the r12 alignment/equivalence wave:
  * banded DTW, TOST, partial correlation, Cronbach's alpha. */
class TimeWarpSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(day: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(2024, 1, day).atStartOfDay)

  /** events with `n` type-a rows on `day`. */
  private def burst(day: Int, typ: String, n: Int) =
    (0 until n).map(i => (ts(day), typ, (day * 1000 + i).toLong))

  test("dtw: an identical series shifted by one day costs near zero") {
    // a: bursts on days 1..8 with counts 1,2,..8; b: same shifted +1
    val rows = (1 to 8).flatMap(d => burst(d, "view", d)) ++
      (1 to 8).flatMap(d => burst(d + 1, "click", d))
    val ev = rows.toDF("ts", "event_type", "event_id")
    val r = TimeWarp.dtwDaily(ev, "view", "click", band = 3)
      .collect()(0)
    // lag-0 L1 on the 9-day spine: 8 mismatches of 1 + the |0-8|
    // tail = 16. The warp absorbs the shift, paying only the two
    // boundary cells: D(1,1)=|1-0|=1, then the zero-cost (i, i+1)
    // ridge, then D(9,9)=|0-8|=8 -> exactly 9.
    assert(r.getLong(2) == 9L, s"dtw=${r.getLong(2)}")
    assert(r.getLong(2) < 16L)
    assert(r.getLong(0) == 9L)   // 9-day spine
  }

  test("dtw: band zero degenerates to the lag-0 L1 distance") {
    val rows = (1 to 6).flatMap(d => burst(d, "view", 5)) ++
      (1 to 6).flatMap(d => burst(d, "click", 3))
    val ev = rows.toDF("ts", "event_type", "event_id")
    val r = TimeWarp.dtwDaily(ev, "view", "click", band = 0)
      .collect()(0)
    assert(r.getLong(2) == 12L, s"dtw=${r.getLong(2)}")   // 6 * |5-3|
  }

  test("tost: identical variants are equivalent, a big lift is not") {
    def units(shift: Double) = (0 until 400).map { i =>
      val noise = (i % 21 - 10) / 10.0
      (i % 2 == 1, 100.0 + noise + (if (i % 2 == 1) shift else 0.0))
    }
    val same = units(0.0).toDF("b", "m")
    val far = units(50.0).toDF("b", "m")
    val rSame = Experiment.tostEquivalence(same, col("b"), col("m"))
      .collect()(0)
    val rFar = Experiment.tostEquivalence(far, col("b"), col("m"))
      .collect()(0)
    assert(rSame.getBoolean(8), s"t=(${rSame.getDouble(6)}," +
      s"${rSame.getDouble(7)})")
    assert(!rFar.getBoolean(8), s"t=(${rFar.getDouble(6)}," +
      s"${rFar.getDouble(7)})")
  }

  test("partial correlation: a confounder-driven association vanishes") {
    // z drives both x and y; given z, x and y are (hash-)independent
    def h(i: Int, s: Int) = {
      var v = i.toLong * 2654435761L + s * -7046029254386353131L
      v ^= v >>> 13; v *= 1274126177L; v ^= v >>> 16
      (((v % 1000L) + 1000L) % 1000L) / 1000.0
    }
    val rows = (0 until 500).map { i =>
      val z = i % 50
      (z * 2.0 + h(i, 1), z * 3.0 + h(i, 2), z.toDouble)
    }
    val df = rows.toDF("x", "y", "z")
    val r = Correlation.partialCorrelation(df, "x", "y", "z")
      .collect()(0)
    assert(r.getDouble(1) > 0.9, s"raw r_xy=${r.getDouble(1)}")
    assert(math.abs(r.getDouble(4)) < 0.15,
      s"partial r_xy_z=${r.getDouble(4)}")
  }

  test("cronbach: parallel items read high alpha, independent read low") {
    // parallel: every user's three item counts ride one trait t_u
    val par = (0 until 200).flatMap { u =>
      val trait_ = 1 + u % 7
      Seq("a", "b", "c").flatMap(it =>
        (0 until trait_).map(j => (u.toLong, it, j)))
    }.toDF("user_id", "event_type", "j")
    // independent: item counts from unrelated hash streams
    def h(i: Int, s: Int) =
      1 + (math.abs((i * 2654435761L + s * 97L) ^ (i >> 3)) % 7).toInt
    val ind = (0 until 200).flatMap { u =>
      Seq(("a", 1), ("b", 2), ("c", 3)).flatMap { case (it, s) =>
        (0 until h(u, s)).map(j => (u.toLong, it, j))
      }
    }.toDF("user_id", "event_type", "j")
    val aPar = Reliability.cronbachAlpha(par, col("user_id"),
      col("event_type")).collect()(0)
    val aInd = Reliability.cronbachAlpha(ind, col("user_id"),
      col("event_type")).collect()(0)
    assert(aPar.getDouble(4) > 0.95, s"parallel=${aPar.getDouble(4)}")
    assert(aInd.getDouble(4) < 0.5,
      s"independent=${aInd.getDouble(4)}")
    assert(aPar.getLong(1) == 3L)
  }
}
