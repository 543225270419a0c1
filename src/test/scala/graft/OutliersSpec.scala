package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Outliers

class OutliersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def series(xs: Seq[Double]) =
    xs.zipWithIndex.map { case (v, i) =>
      (i.toLong, java.sql.Timestamp.valueOf(
        f"2024-0${i / 28 + 1}%01d-${i % 28 + 1}%02d 12:00:00"),
        1L, "view", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("grubbs: a planted spike is flagged and dated; clean data is not") {
    // 29 quiet days around 100 plus one 500 spike on day 8
    val xs = (0 until 30).map {
      case 7 => 500.0
      case i => 100.0 + (i % 5)   // mild deterministic wiggle
    }
    val r = Outliers.grubbs(series(xs)).collect().head
    assert(r.getLong(0) == 30L)
    assert(r.getBoolean(5), s"g=${r.getDouble(3)} crit=${r.getDouble(4)}")
    assert(r.getDate(6).toString == "2024-01-08")
    // the critical value replays the textbook n = 30 tabulation:
    // two-sided alpha = 0.05 -> G_crit ~= 2.9085 (Grubbs/ISO 5725
    // table); the Acklam+Cornish-Fisher chain must land within 2e-3
    assert(math.abs(r.getDouble(4) - 2.9085) < 2e-3,
      s"crit=${r.getDouble(4)}")
    // clean wiggle only: not significant
    val clean = Outliers.grubbs(series(
      (0 until 30).map(i => 100.0 + (i % 5)))).collect().head
    assert(!clean.getBoolean(5), s"g=${clean.getDouble(3)}")
    // below the n >= 21 floor: crit NULL, never significant
    val tiny = Outliers.grubbs(series(
      Seq(1.0, 2, 3, 2, 1, 50))).collect().head
    assert(tiny.isNullAt(4) && !tiny.getBoolean(5))
  }
}
