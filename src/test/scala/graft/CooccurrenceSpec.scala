package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Cooccurrence
import graft.quality.Agreement

/** Hand-computed PMI/NPMI and Cohen's κ cases. */
class CooccurrenceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(id: Long, user: Long, day: Int, et: String) =
    (id, java.sql.Timestamp.valueOf(f"2024-03-$day%02d 10:00:00"),
      user, et, 1.0, "{}")

  private def frame(rows: Seq[(Long, java.sql.Timestamp, Long, String,
      Double, String)]) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("pmi: perfect co-occurrence pins npmi to 1; independence scores 0") {
    // 4 user-days; a and b co-present in ALL of them → p_ab = 1
    val always = frame((1 to 4).flatMap(d => Seq(
      ev(d * 10L, 1L, d, "a"), ev(d * 10L + 1, 1L, d, "b"))))
    val top = Cooccurrence.sessionPmi(always)
      .select("n_ab", "pmi_bits", "npmi")
      .as[(Long, Double, Double)].collect().head
    // N = 4, n_a = n_b = n_ab = 4: pmi = log2(4·4/16) = 0, npmi pinned 1
    assert(top == ((4L, 0.0, 1.0)))
    // x everywhere, y in half: pmi(x,y) = log2(2·4/(4·2)) = 0
    val ind = frame((1 to 4).map(d => ev(d * 10L, 1L, d, "x")) ++
      Seq(1, 2).map(d => ev(d * 100L, 1L, d, "y")))
    val r = Cooccurrence.sessionPmi(ind)
      .select("n_ab", "pmi_bits").as[(Long, Double)].collect().head
    assert(r == ((2L, 0.0)))
  }

  test("pmi: positive association beats negative, hand values") {
    // N = 4 user-days: {a,b}, {a,b}, {a}, {c} →
    // pair (a,b): n_ab=2, n_a=3, n_b=2 → pmi = log2(2·4/6) = log2(4/3)
    val e = frame(Seq(
      ev(1, 1, 1, "a"), ev(2, 1, 1, "b"),
      ev(3, 1, 2, "a"), ev(4, 1, 2, "b"),
      ev(5, 1, 3, "a"), ev(6, 1, 4, "c")))
    val got = Cooccurrence.sessionPmi(e)
      .select("et_a", "et_b", "n_ab", "pmi_bits")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val expect = BigDecimal(math.log(4.0 / 3.0) / math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(("a", "b")) == ((2L, expect)))
    // (a,c) and (b,c) never co-occur → absent from the pair table
    assert(!got.contains(("a", "c")) && !got.contains(("b", "c")))
  }

  test("kappa: hand confusion matrix; perfect and chance-level agreement") {
    // labelers: A = v >= 10, B = w >= 10 over 10 rows
    // cells: n11=4, n10=1, n01=2, n00=3 → po=0.7
    // pe = 0.5·0.6 + 0.5·0.4 = 0.5 → kappa = 0.4
    val df = (Seq.fill(4)((10, 10)) ++ Seq.fill(1)((10, 0)) ++
      Seq.fill(2)((0, 10)) ++ Seq.fill(3)((0, 0))).toDF("v", "w")
    val r = Agreement.cohenKappa(df, col("v") >= 10, col("w") >= 10)
      .select("n11", "n10", "n01", "n00", "po", "pe", "kappa")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((4L, 1L, 2L, 3L)))
    assert((r.getDouble(4), r.getDouble(5), r.getDouble(6)) ==
      ((0.7, 0.5, 0.4)))
    // identical labelers → kappa 1 even when pe = 1 (degenerate pin)
    val const = Seq.fill(5)((1, 1)).toDF("v", "w")
    val k1 = Agreement.cohenKappa(const, col("v") === 1, col("w") === 1)
      .select("kappa").as[Double].collect().head
    assert(k1 == 1.0)
  }

  test("kappa: null-labeled rows are excluded") {
    val df = Seq((Some(1), Some(1)), (Some(1), None), (None, Some(0)))
      .toDF("v", "w")
    val r = Agreement.cohenKappa(df, col("v") === 1, col("w") === 1)
      .select("n").as[Long].collect().head
    assert(r == 1L, "only the fully-labeled row counts")
  }

  test("fano: constant series is under-dispersed, bursty series over-dispersed, zero-days count") {
    // steady: 1 event every day for 4 days → var 0 → fano 0 (under)
    // bursty: 4 events on one day, silent the other 3 → mean 1,
    //         var = (9 + 3·1)/4 = 3 → fano 3 (over)
    val e = frame(
      (1 to 4).map(d => ev(d.toLong, 1L, d, "steady")) ++
        (1 to 4).map(i => ev(100L + i, i.toLong, 1, "bursty")))
    val got = graft.operators.Anomaly.fanoFactor(e)
      .select("event_type", "n_days", "mean_daily", "fano", "dispersion")
      .as[(String, Long, Double, Double, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("steady") == ((4L, 1.0, 0.0, "under")))
    assert(got("bursty") == ((4L, 1.0, 3.0, "over")),
      "silent days must zero-fill into the variance")
  }
}
