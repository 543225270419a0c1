package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import graft.marts.DailyStoreMetrics

/** Golden test for the fact build — hand-computed expectations, in the
  * spirit of the reference's fixed 17-row fixture pipeline
  * (reference samples/, local_runner.py:169-184). */
class DailyStoreMetricsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("fact build: aggregates, FOJ key coalescing, zero-fill, sort") {
    val orders = Seq(
      // store 1 (custkey 11 % 10), day 1: two orders, one 'F'
      (1L, 11L, "F", 100.50, ts("2024-06-01 00:00:00")),
      (2L, 21L, "O", 239.00, ts("2024-06-01 00:00:00")),
      // store 2, day 2: one order
      (3L, 2L, "F", 50.00, ts("2024-06-02 00:00:00")))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    val events = Seq(
      // store 1 (user 31 % 10), day 1: two sessions, one visitor
      (1L, ts("2024-06-01 10:00:00"), 31L),
      (2L, ts("2024-06-01 11:00:00"), 31L),
      // store 7, day 3: orders-side is null → zero-fill path
      (3L, ts("2024-06-03 09:00:00"), 7L))
      .toDF("event_id", "ts", "user_id")

    val got = DailyStoreMetrics.build(orders, events)
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getDouble(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))

    assert(got.toSeq == Seq(
      (1L, "2024-06-01", 339.50, 2L, 1L, 2L, 1L),   // both sides present
      (2L, "2024-06-02", 50.00, 1L, 1L, 0L, 0L),    // events side zero-filled
      (7L, "2024-06-03", 0.00, 0L, 0L, 1L, 1L)))    // orders side zero-filled
  }
}
