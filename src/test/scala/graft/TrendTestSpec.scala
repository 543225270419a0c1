package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Experiment

/** Cochran–Armitage trend and McNemar paired-conversion tests. */
class TrendTestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(rows: (Long, String, String)*) =
    rows.map { case (u, t, e) =>
      (u, java.sql.Timestamp.valueOf(t), e)
    }.toDF("user_id", "ts", "event_type")

  test("cochran-armitage detects a monotone conversion trend") {
    // 3 groups scored 1,2,3 with conversion 1/10, 5/10, 9/10
    val rows = (1 to 10).flatMap { i =>
      Seq(
        (i.toLong, "2024-06-03 10:00:00",
          if (i <= 1) "buy" else "view"),   // Monday, score 2
        (i.toLong, "2024-06-04 10:00:00",
          if (i <= 5) "buy" else "view"),   // Tuesday, score 3
        (i.toLong, "2024-06-05 10:00:00",
          if (i <= 9) "buy" else "view"))   // Wednesday, score 4
    }
    val r = Experiment.cochranArmitage(ev(rows: _*),
      dayofweek(col("ts")), col("event_type") === "buy")
      .collect().head
    assert(r.getLong(0) == 3L)
    assert(r.getLong(1) == 30L)
    assert(r.getLong(2) == 15L)
    // hand value: num = sum(w*n1) - sum(w*n)*p = (2+10+27)... compute:
    // w=2: n1=1; w=3: n1=5; w=4: n1=9; n=10 each; p=0.5
    // sw1 = 2+15+36 = 53; swn = 90; num = 53-45 = 8
    // sw2n = 4*10+9*10+16*10 = 290; den = sqrt(.25*(290-8100/30))
    //      = sqrt(.25*20) = sqrt(5)
    assert(math.abs(r.getDouble(4) - 8.0 / math.sqrt(5.0)) < 1e-6)
    assert(r.getBoolean(5))
  }

  test("mcnemar counts discordant pairs across the halves") {
    // span 2024-06-01 .. 2024-06-30, midpoint = 06-15 (14 days in)
    // u1: buys only in H1; u2,u3: buy only in H2; u4: both; u5: never
    val r = Experiment.mcnemar(ev(
      (1L, "2024-06-01 08:00:00", "buy"),
      (1L, "2024-06-20 08:00:00", "view"),
      (2L, "2024-06-02 08:00:00", "view"),
      (2L, "2024-06-21 08:00:00", "buy"),
      (3L, "2024-06-03 08:00:00", "view"),
      (3L, "2024-06-22 08:00:00", "buy"),
      (4L, "2024-06-04 08:00:00", "buy"),
      (4L, "2024-06-23 08:00:00", "buy"),
      (5L, "2024-06-05 08:00:00", "view"),
      (5L, "2024-06-30 08:00:00", "view")),
      col("event_type") === "buy").collect().head
    assert(r.getLong(0) == 5L)
    assert(r.getLong(1) == 1L, "n_00")
    assert(r.getLong(2) == 2L, "n_01")
    assert(r.getLong(3) == 1L, "n_10")
    assert(r.getLong(4) == 1L, "n_11")
    // chi2 = (2-1)^2/3
    assert(math.abs(r.getDouble(5) - 1.0 / 3.0) < 1e-6)
    assert(!r.getBoolean(6))
  }
}
