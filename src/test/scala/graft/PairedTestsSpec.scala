package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{ExactTests, GraphRank, Homogeneity, PairedTests}

/** Planted-case semantics for the r12 paired/ordered/exact test wave:
  * Wilcoxon signed-rank + sign, Fisher's exact, Jonckheere-Terpstra,
  * HITS. */
class PairedTestsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(day: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(2024, 1, day).atStartOfDay)

  test("signed rank: a second-half activity lift is detected") {
    // 40 users, 10-day span: every user has 1 event in days 1-5 and
    // 2 + (i % 3) events in days 6-10 -> all diffs positive
    val rows = (0 until 40).flatMap { i =>
      Seq((i.toLong, ts(1), 0L)) ++
        (0 until 2 + i % 3).map(j => (i.toLong, ts(8), j.toLong))
    }.map { case (u, t, e) => (e, t, u) }
    val ev = rows.toDF("event_id", "ts", "user_id")
    val r = PairedTests.signedRankHalves(ev).collect()(0)
    assert(r.getLong(0) == 40L)
    assert(r.getLong(2) == 40L && r.getLong(3) == 0L)
    assert(r.getBoolean(7), s"z_w=${r.getDouble(5)}")
    assert(r.getBoolean(8), s"z_s=${r.getDouble(6)}")
  }

  test("signed rank: symmetric diffs read null-ish") {
    // half the users +1, half -1, a few zeros
    val rows = (0 until 30).flatMap { i =>
      val first = Seq((i.toLong, ts(1), 0L), (i.toLong, ts(2), 1L))
      val second =
        if (i % 3 == 0) Seq((i.toLong, ts(8), 2L))            // -1
        else if (i % 3 == 1)
          Seq((i.toLong, ts(8), 2L), (i.toLong, ts(9), 3L),
            (i.toLong, ts(9), 4L))                             // +1
        else Seq((i.toLong, ts(8), 2L), (i.toLong, ts(9), 3L)) // 0
      first ++ second
    }.map { case (u, t, e) => (e, t, u) }
    val ev = rows.toDF("event_id", "ts", "user_id")
    val r = PairedTests.signedRankHalves(ev).collect()(0)
    assert(r.getLong(1) == 10L, s"n_zero=${r.getLong(1)}")
    assert(!r.getBoolean(7) && !r.getBoolean(8),
      s"z_w=${r.getDouble(5)} z_s=${r.getDouble(6)}")
  }

  test("fisher exact: the tea-tasting table reproduces R's p-values") {
    // [[3,1],[1,3]]: two-sided p = 0.485714..., OR(sample) = 9
    val rows =
      Seq.fill(3)((true, true)) ++ Seq.fill(1)((true, false)) ++
        Seq.fill(1)((false, true)) ++ Seq.fill(3)((false, false))
    val df = rows.toDF("a", "b")
    val r = ExactTests.fisherExact(df, col("a"), col("b"))
      .collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(3) == 3L)
    assert(math.abs(r.getDouble(4) - 9.0) < 1e-9)
    assert(math.abs(r.getDouble(8) - 0.485714) < 1e-6,
      s"p2=${r.getDouble(8)}")
    // one-sided right tail: P(X >= 3) = (16 + 1) / 70
    assert(math.abs(r.getDouble(7) - 17.0 / 70.0) < 1e-6,
      s"pr=${r.getDouble(7)}")
  }

  test("fisher exact: independence reads p ~ 1") {
    val rows = for (i <- 0 until 80) yield (i % 2 == 0, i % 4 < 2)
    val r = ExactTests.fisherExact(rows.toDF("a", "b"),
      col("a"), col("b")).collect()(0)
    assert(r.getDouble(8) > 0.8, s"p2=${r.getDouble(8)}")
  }

  test("jonckheere: a rising ordered trend is detected, flat is not") {
    def band(g: Int, base: Int) =
      (0 until 50).map(i => (g, (base + i % 5).toLong))
    val rising = (band(0, 1) ++ band(1, 4) ++ band(2, 7))
      .toDF("g", "v")
    val flat = (band(0, 5) ++ band(1, 5) ++ band(2, 5))
      .toDF("g", "v")
    val rR = Homogeneity.jonckheere(rising, col("g"), col("v"))
      .collect()(0)
    val rF = Homogeneity.jonckheere(flat, col("g"), col("v"))
      .collect()(0)
    assert(rR.getBoolean(6) && rR.getDouble(5) > 0.0,
      s"rising z=${rR.getDouble(5)}")
    assert(!rF.getBoolean(6), s"flat z=${rF.getDouble(5)}")
    assert(rR.getLong(0) == 150L && rR.getLong(1) == 3L)
  }

  test("hits: star sources are hubs, the center is the authority") {
    // 1..4 all point at 5; 5 points at 6
    val edges = Seq((1, 5, 10L), (2, 5, 10L), (3, 5, 10L),
      (4, 5, 10L), (5, 6, 1L)).toDF("src", "dst", "w")
    val r = GraphRank.hits(spark, edges).collect()
      .map(x => x.getLong(0) -> (x.getDouble(1), x.getDouble(2)))
      .toMap
    val maxAuth = r.maxBy(_._2._2)
    assert(maxAuth._1 == 5L, s"authority should be 5: $r")
    // spokes are (equal) top hubs
    val hubs = r.filter(_._2._1 == r.values.map(_._1).max).keySet
    assert(hubs == Set(1L, 2L, 3L, 4L), s"hubs=$hubs")
    // L1 normalization: scores sum to ~1 on each side
    assert(math.abs(r.values.map(_._1).sum - 1.0) < 1e-3)
    assert(math.abs(r.values.map(_._2).sum - 1.0) < 1e-3)
  }
}
