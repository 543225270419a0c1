package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import graft.operators.{AsOfJoin, Sessionize}

class AsOfSessionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("built-in session_window merges an event at exactly gap distance") {
    import org.apache.spark.sql.functions._
    // pins the closure semantics the q51 oracle depends on (strictly
    // greater than gap starts a new session — same as custom Sessionize)
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:30:00"), 2.0),   // exactly gap later => MERGES
      (1L, ts("2024-01-01 11:00:01"), 3.0))   // > gap after previous => new
    val got = events.toDF("user_id", "ts", "value")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").cast("string").as("s"), col("n"))
      .orderBy("s")
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("2024-01-01 10:00:00", 2L), ("2024-01-01 11:00:01", 1L)),
      s"session_window boundary semantics changed: $got")
  }

  test("asofBackward picks the latest right state at or before left ts") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 110.0),
      (2L, ts("2024-01-01 10:30:00"), 55.0))
      .toDF("key", "ts", "price")
    val trades = Seq(
      (101L, 1L, ts("2024-01-01 10:30:00")),  // after 10:00 quote → 100.0
      (102L, 1L, ts("2024-01-01 11:00:00")),  // equal ts → 110.0 (<= semantics)
      (103L, 1L, ts("2024-01-01 09:00:00")),  // before any quote → dropped
      (104L, 2L, ts("2024-01-01 12:00:00")))  // → 55.0
      .toDF("trade_id", "key", "tts")

    val got = AsOfJoin.asofBackward(trades, quotes, "key", "tts", "ts", Seq("price"))
      .select("trade_id", "price").as[(Long, Double)].collect().toMap
    assert(got == Map(101L -> 100.0, 102L -> 110.0, 104L -> 55.0))
  }

  test("sessionize splits on gaps and aggregates per session") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:10:00"), 2.0),   // same session (10 min gap)
      (1L, ts("2024-01-01 11:30:00"), 3.0),   // > 30 min gap → new session
      (2L, ts("2024-01-01 10:00:00"), 4.0))
      .toDF("user_id", "ts", "value")
    val got = Sessionize.sessionStats(events, "user_id", "ts", 1800, "value")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 2L, 600000000L, 3.0),
      (1L, 2L, 1L, 0L, 3.0),
      (2L, 1L, 1L, 0L, 4.0)))
  }
}
