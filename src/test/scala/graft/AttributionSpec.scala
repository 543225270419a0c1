package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Attribution

/** Markov attribution on hand-built journeys: transition extraction
  * (segments, START/CONV/NULL states), the absorbing-chain solve on
  * a chain with a known closed form, and removal effects on a
  * two-channel funnel where one channel is on every converting path. */
class AttributionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def events(rows: (Long, String, String)*) =
    rows.zipWithIndex.map { case ((u, ts, t), i) => (u, ts, i.toLong, t) }
      .toDF("user_id", "ts_s", "event_id", "event_type")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")

  test("transition extraction: segments split at purchases, trailing NULL") {
    val ev = events(
      (1L, "2024-01-01 00:00:01", "click"),
      (1L, "2024-01-01 00:00:02", "view"),
      (1L, "2024-01-01 00:00:03", "purchase"),
      (1L, "2024-01-01 00:00:04", "click"), // new segment, unconverted
      (2L, "2024-01-01 00:00:01", "view"))
    val t = Attribution.transitions(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(t == Map(
      ("START", "click") -> 2L, // user 1, both segments
      ("click", "view") -> 1L,
      ("view", "CONV") -> 1L,
      ("START", "view") -> 1L, // user 2
      ("view", "NULL") -> 1L,  // user 2 trails off
      ("click", "NULL") -> 1L  // user 1 segment 2
    ), s"got $t")
  }

  test("value iteration matches the closed form of a 2-state chain") {
    // START->a 1.0; a: 0.5 CONV, 0.25 a, 0.25 NULL
    // v(a) = 0.5 + 0.25 v(a) => v(a) = 2/3
    val probs = Map(
      ("START", "a") -> 1.0,
      ("a", "CONV") -> 0.5, ("a", "a") -> 0.25, ("a", "NULL") -> 0.25)
    val p = Attribution.solveConversion(probs, Seq("a"), Set.empty)
    assert(math.abs(p - 2.0 / 3.0) < 1e-9, s"got $p")
    // removing the only channel kills all conversion
    assert(Attribution.solveConversion(probs, Seq("a"), Set("a")) == 0.0)
  }

  test("removal effects: a channel on every converting path gets full credit") {
    // every journey is view->click->purchase: both channels sit on
    // every converting path (note the chain is memoryless — a
    // START->click edge from any other user would open a view-free
    // converting path and dilute view's effect)
    val ev = events(
      (1L, "2024-01-01 00:00:01", "view"),
      (1L, "2024-01-01 00:00:02", "click"),
      (1L, "2024-01-01 00:00:03", "purchase"),
      (2L, "2024-01-01 00:00:01", "view"),
      (2L, "2024-01-01 00:00:02", "click"),
      (2L, "2024-01-01 00:00:03", "purchase"))
    val m = Attribution.removalEffects(spark, ev).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // every conversion passes through BOTH view and click: removing
    // either zeroes conversion -> removal effect 1.0 each, shares 0.5
    assert(m("view")._1 == 1.0 && m("click")._1 == 1.0, s"got $m")
    assert(m("view")._2 == 0.5 && m("click")._2 == 0.5, s"got $m")
  }

  test("a channel absent from converting paths gets zero credit") {
    val ev = events(
      (1L, "2024-01-01 00:00:01", "click"),
      (1L, "2024-01-01 00:00:02", "purchase"),
      (2L, "2024-01-01 00:00:01", "error")) // never converts
    val m = Attribution.removalEffects(spark, ev).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(m("click") == 1.0 && m("error") == 0.0, s"got $m")
  }
}
