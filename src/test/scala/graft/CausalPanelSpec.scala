package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{CausalPanel, CoxPh}

/** Planted-case semantics for the r12 causal wave: Wald IV, Cox
  * proportional hazards, Mantel-Haenszel. */
class CausalPanelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("iv wald: LATE = ITT / first stage, exact on a planted design") {
    // assignment z = parity moves exposure from 1/5 to 3/5 (first
    // stage 0.4); exposure adds exactly 10 to the outcome; the base
    // outcome (i/2 % 50) is IDENTICAL across arms, so z has no
    // direct path and LATE must read the pure exposure effect
    val rows = (0 until 1000).map { i =>
      val zz = i % 2 == 1
      val exposed = if (zz) i % 10 < 7 else i % 10 < 2
      val base = ((i / 2) % 50).toDouble
      (zz, if (exposed) 1.0 else 0.0,
        base + (if (exposed) 10.0 else 0.0))
    }
    val r = CausalPanel.ivWald(rows.toDF("z", "x", "y"),
      col("z"), col("x"), col("y")).collect()(0)
    assert(math.abs(r.getDouble(3) - 0.4) < 1e-9,
      s"first_stage=${r.getDouble(3)}")
    assert(math.abs(r.getDouble(4) - 10.0) < 1e-6,
      s"late=${r.getDouble(4)}")
  }

  test("iv wald: a dead instrument yields a null LATE") {
    val rows = (0 until 100).map(i =>
      (i % 2 == 1, 1.0, i.toDouble))   // exposure never moves
    val r = CausalPanel.ivWald(rows.toDF("z", "x", "y"),
      col("z"), col("x"), col("y")).collect()(0)
    assert(r.isNullAt(4), s"late=${r.get(4)}")
  }

  test("cox: a treated arm that converts faster reads HR > 1 and sig") {
    // odd users purchase on day 1; even users purchase on day 8 (or
    // censor): strong positive hazard for x = 1
    def ts(day: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(2024, 1, day).atStartOfDay)
    val rows = (0 until 200).flatMap { u =>
      val treated = u % 2 == 1
      Seq((u.toLong, ts(1), "view")) ++
        (if (treated) Seq((u.toLong, ts(2), "purchase"))
         else if (u % 4 == 0) Seq((u.toLong, ts(9), "purchase"))
         else Seq((u.toLong, ts(9), "view")))
    }
    val ev = rows.toDF("user_id", "ts", "event_type")
    val r = CoxPh.fit(ev).collect()(0)
    assert(r.getLong(0) == 200L && r.getLong(2) == 100L)
    assert(r.getDouble(4) > 2.0, s"HR=${r.getDouble(4)}")
    assert(r.getBoolean(7), s"z=${r.getDouble(6)}")
  }

  test("cox: identical arms read HR ~ 1, not significant") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(2024, 1, day).atStartOfDay)
    val rows = (0 until 200).flatMap { u =>
      val d = 2 + (u / 2) % 6   // same timing distribution per arm
      Seq((u.toLong, ts(1), "view"), (u.toLong, ts(d), "purchase"))
    }
    val r = CoxPh.fit(rows.toDF("user_id", "ts", "event_type"))
      .collect()(0)
    assert(math.abs(r.getDouble(3)) < 0.05, s"beta=${r.getDouble(3)}")
    assert(!r.getBoolean(7))
  }

  test("mantel-haenszel: pools the within-stratum OR, not the pooled-table one") {
    // classic confounding: stratum A is mostly treated with a high
    // base rate, stratum B mostly control with a low base rate;
    // within each stratum treatment exactly DOUBLES the odds
    val rows =
      // stratum A: treated 80 (40 succ), control 20 (5 succ)
      //   -> OR = (40/40)/(5/15) = 3
      (0 until 80).map(i => ("A", true, i < 40)) ++
        (0 until 20).map(i => ("A", false, i < 5)) ++
        // stratum B: treated 20 (4 succ), control 80 (5 succ)
        //   -> OR = (4/16)/(5/75) = 3.75
        (0 until 20).map(i => ("B", true, i < 4)) ++
        (0 until 80).map(i => ("B", false, i < 5))
    val r = CausalPanel.mantelHaenszel(rows.toDF("s", "t", "y"),
      col("s"), col("t"), col("y")).collect()(0)
    assert(r.getLong(0) == 200L && r.getLong(1) == 2L)
    val or = r.getDouble(2)
    assert(or > 2.5 && or < 4.0, s"or_mh=$or")
    assert(r.getBoolean(4), s"cmh=${r.getDouble(3)}")
  }
}
