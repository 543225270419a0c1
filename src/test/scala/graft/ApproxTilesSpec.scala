package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import graft.operators.{Retention, Sampling}

/** The sketch-threshold scale paths of RFM segmentation and curriculum
  * sharding must agree with their exact NTILE forms wherever the two
  * are mathematically equal: tie-free values, row count divisible by
  * the tile count, count below the sketch accuracy (so
  * percentile_approx degenerates to the exact value at ascending rank
  * ceil(p·n) — exactly NTILE's tile-k upper boundary).
  */
class ApproxTilesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 64 users with tie-free recency/frequency/monetary, each dimension
  // ranked by a DIFFERENT coprime permutation of 0..63 so the quartile
  // grid doesn't collapse to the diagonal.
  private def tieFreeEvents = {
    val rows = for {
      u <- 0 until 64
      nEvents = (u * 13 % 64) + 1 // distinct frequencies, permuted
      e <- 0 until nEvents
    } yield (f"user$u%03d",
      // distinct recencies: last event (e=0) at permuted minute rank
      new Timestamp(1700000000000L + (u * 29 % 64).toLong * 60000L
        - e * 1000L),
      // distinct monetary sums: equal per-event slices of a permuted
      // target, spaced far beyond double rounding
      (1.0 + (u * 41 % 64) * 0.37) / nEvents)
    rows.toDF("user_id", "ts", "value")
  }

  test("rfmSegmentsApprox == rfmSegments on a tie-free, divisible fixture") {
    val ev = tieFreeEvents
    val exact = Retention.rfmSegments(ev).collect().toSeq
    val approx = Retention.rfmSegmentsApprox(ev).collect().toSeq
    assert(exact == approx)
    // sanity: a real grid, not one degenerate cell
    assert(exact.size > 4)
  }

  test("rfmSegmentsApprox plan has no window sort; exact form does") {
    val ev = tieFreeEvents
    val exactPlan =
      Retention.rfmSegments(ev).queryExecution.executedPlan.toString
    val approxPlan =
      Retention.rfmSegmentsApprox(ev).queryExecution.executedPlan.toString
    assert(exactPlan.contains("Window"),
      "exact form is the ntile window (oracle path)")
    assert(!approxPlan.contains("Window"),
      "approx form must not contain a window (no single-task global sort)")
    assert(approxPlan.contains("BroadcastNestedLoopJoin")
      || approxPlan.contains("BroadcastExchange"),
      "thresholds travel as a broadcast, not a shuffle")
  }

  test("curriculumShardsApprox == curriculumShards on tie-free scores") {
    // 40 rows, distinct scores, 4 shards → boundaries at ranks 10/20/30
    val df = (1 to 40).map(i => (i.toLong, 0.013 * i)).toDF("doc_id", "score")
    val exact = Sampling.curriculumShards(df, "score", 4, Seq("doc_id"))
      .select("doc_id", "shard").as[(Long, Int)].collect().toMap
    val approx = Sampling.curriculumShardsApprox(df, "score", 4)
      .select("doc_id", "shard").as[(Long, Int)].collect().toMap
    assert(exact == approx)
    assert(exact.values.toSeq.sorted.distinct == Seq(1, 2, 3, 4))
  }

  test("rfmSegmentsApprox: all-tied users collapse to one cell; grid sums to user count") {
    // every user identical on all three dimensions → thresholds all
    // equal the common value → no user exceeds any → cell (1,1,1)
    val tied = (0 until 12).flatMap(u => Seq(
      (f"user$u%02d", new Timestamp(1700000000000L), 2.5),
      (f"user$u%02d", new Timestamp(1700000100000L), 2.5)))
      .toDF("user_id", "ts", "value")
    val grid = Retention.rfmSegmentsApprox(tied)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(grid.toSeq == Seq((1, 1, 1, 12L)))
    // and on the mixed fixture the grid always partitions the users
    val total = Retention.rfmSegmentsApprox(tieFreeEvents)
      .agg(sum("n_users")).collect()(0).getLong(0)
    assert(total == 64L)
  }

  test("curriculumShardsApprox: ties land in one shard; nShards=1 identity") {
    // all-equal scores → every row is <= every threshold → shard 1
    val tied = (1 to 8).map(i => (i.toLong, 0.5)).toDF("doc_id", "score")
    val shards = Sampling.curriculumShardsApprox(tied, "score", 4)
      .select("shard").as[Int].collect().toSet
    assert(shards == Set(1))
    val one = Sampling.curriculumShardsApprox(tied, "score", 1)
      .select("shard").as[Int].collect().toSet
    assert(one == Set(1))
  }
}
