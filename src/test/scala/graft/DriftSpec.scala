package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Drift, Sessionize}

class DriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("psi: identical distributions score ~0; a planted shift scores high") {
    val base = (1 to 100).map(i => (i % 10) * 10.0).toDF("v")
    val same = Drift.psiReport(base, base, "v", bucketWidth = 10.0)
    assert(same.agg(sum("psi_term")).collect()(0).getDouble(0) == 0.0)
    // current shifted entirely into two buckets the baseline barely has
    val cur = (1 to 100).map(i => 80.0 + (i % 2) * 10.0).toDF("v")
    val drifted = Drift.psiReport(base, cur, "v", bucketWidth = 10.0)
    assert(drifted.agg(sum("psi_term")).collect()(0).getDouble(0) > 0.25)
    // psi terms are non-negative and empty buckets are floored, not ±inf
    val terms = drifted.select("psi_term").as[Double].collect()
    assert(terms.forall(t => t >= 0.0 && !t.isInfinite && !t.isNaN))
  }

  test("psi term math: hand-computed two-bucket case") {
    val base = Seq(1.0, 1.0, 1.0, 11.0).toDF("v")     // p = .75 / .25
    val cur = Seq(1.0, 11.0, 11.0, 11.0).toDF("v")    // p = .25 / .75
    val got = Drift.psiReport(base, cur, "v", bucketWidth = 10.0)
      .select("bucket", "psi_term").as[(Long, Double)].collect().toMap
    val expect = BigDecimal((0.25 - 0.75) * math.log(0.25 / 0.75))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0L) == expect && got(1L) == expect)
  }

  test("transition matrix: strict per-user ordering with tie-break, probs sum to 1") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), "a"),
      (1L, 11L, ts("2024-01-01 10:01:00"), "b"),
      (1L, 12L, ts("2024-01-01 10:02:00"), "a"),
      // same-timestamp pair for u2: event_id breaks the tie → c then a
      (2L, 20L, ts("2024-01-01 09:00:00"), "c"),
      (2L, 21L, ts("2024-01-01 09:00:00"), "a"),
      (3L, 30L, ts("2024-01-01 08:00:00"), "a"))  // singleton: no transition
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = Sessionize.transitionMatrix(events)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("a", "b", 1L, 1.0),
      ("b", "a", 1L, 1.0),
      ("c", "a", 1L, 1.0)))
    // per-from probabilities always sum to 1
    val sums = Sessionize.transitionMatrix(events)
      .groupBy("from_type").agg(sum("prob").as("s"))
      .select("s").as[Double].collect()
    assert(sums.forall(_ == 1.0))
  }

  test("embeddingDrift: hand-computed centroids, orthogonal shift and no-shift") {
    def frame(rows: Seq[(Long, Int, Seq[Float])]) =
      rows.toDF("vec_id", "label", "embedding")
    // label 0: old centroid (1,0) [two identical vectors], new (0,1)
    //   → cos 0, L2 sqrt(2)
    // label 1: identical both sides → cos 1, L2 0
    val oldE = frame(Seq(
      (1L, 0, Seq(1f, 0f)), (2L, 0, Seq(1f, 0f)),
      (3L, 1, Seq(3f, 4f))))
    val newE = frame(Seq(
      (4L, 0, Seq(0f, 1f)),
      (5L, 1, Seq(3f, 4f)), (6L, 1, Seq(3f, 4f))))
    val got = Drift.embeddingDrift(oldE, newE)
      .as[(Int, Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      (0, 2L, 1L, 0.0, math.sqrt(2.0) match { case r => math.rint(r * 1e6) / 1e6 }),
      (1, 1L, 2L, 1.0, 0.0)), got.toString)
    // mixed centroid: label 0 old vectors (1,0) and (0,1) → centroid
    // (.5,.5); new (1,1) → cos exactly 1 (same direction), L2 > 0
    val mixOld = frame(Seq((1L, 0, Seq(1f, 0f)), (2L, 0, Seq(0f, 1f))))
    val mixNew = frame(Seq((3L, 0, Seq(1f, 1f))))
    val mix = Drift.embeddingDrift(mixOld, mixNew)
      .as[(Int, Long, Long, Double, Double)].collect().head
    assert(mix._4 == 1.0 && mix._5 > 0.7 && mix._5 < 0.71, mix.toString)
  }
}
