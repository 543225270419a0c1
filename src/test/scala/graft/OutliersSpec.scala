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

  test("grubbs/gesd: alpha outside the quantile-chain domain rejected") {
    val df = series((0 until 30).map(i => 100.0 + (i % 5)))
    intercept[IllegalArgumentException](Outliers.grubbs(df, 0.2))
    intercept[IllegalArgumentException](Outliers.gesd(df, -0.01))
  }

  test("gesd: two masked outliers that Grubbs misses are both caught") {
    // 28 quiet days in 100..104 plus TWO comparable 108 spikes: the
    // pair inflates s enough that the single-shot Grubbs G stays
    // under the n = 30 critical value (G = 2.733 < 2.908, masking),
    // but after removing the first spike GESD's round-2 re-estimated
    // moments expose the second (G = 3.244 > 2.893) — and the
    // last-significant-round rule then back-flags round 1.
    val xs = (0 until 30).map {
      case 7  => 108.0
      case 19 => 108.0
      case i  => 100.0 + (i % 5)
    }
    val g = Outliers.grubbs(series(xs)).collect().head
    assert(!g.getBoolean(5),
      s"fixture must mask Grubbs: g=${g.getDouble(3)} crit=${g.getDouble(4)}")
    val rows = Outliers.gesd(series(xs)).collect()
    assert(rows.length == 3)
    val byRound = rows.map(r => r.getLong(0) -> r).toMap
    // rounds: n shrinks by one each removal
    assert(byRound(1L).getLong(1) == 30L)
    assert(byRound(2L).getLong(1) == 29L)
    assert(byRound(3L).getLong(1) == 28L)
    // both spike days surface as the first two argmax rounds
    val worst2 = Seq(byRound(1L).getDate(4).toString,
      byRound(2L).getDate(4).toString).sorted
    assert(worst2 == Seq("2024-01-08", "2024-01-20"), worst2.toString)
    // round 2 clears its critical value; the GESD rule back-flags
    // round 1; round 3 (clean residual) is not flagged
    assert(byRound(2L).getBoolean(5))
    assert(byRound(1L).getBoolean(5),
      "last-significant-round rule must back-flag the masked round 1")
    assert(!byRound(3L).getBoolean(5))
  }

  test("gesd: clean series flags nothing") {
    val rows = Outliers.gesd(series(
      (0 until 30).map(i => 100.0 + (i % 5)))).collect()
    assert(rows.length == 3 && rows.forall(!_.getBoolean(5)))
  }
}
