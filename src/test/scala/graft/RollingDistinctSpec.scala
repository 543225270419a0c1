package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RollingDistinct

/** Rolling distinct semantics: window membership at the boundaries,
  * dedup within the window, observed-days-only reporting, and the
  * sketch path landing within HLL tolerance of exact. */
class RollingDistinctSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(rows: (String, Long)*) =
    rows.toDF("ts", "user_id")
      .withColumn("ts", org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.col("ts")))

  test("a user active on day d counts for exactly days d..d+6") {
    // one user on Jan 1; observed days Jan 1, Jan 7, Jan 8
    val r = RollingDistinct.activeKeys(ev(
      ("2024-01-01 10:00:00", 1L),
      ("2024-01-07 10:00:00", 2L),
      ("2024-01-08 10:00:00", 3L)), windowDays = 7)
      .collect().map(x => x.getDate(0).toString -> x.getLong(1)).toMap
    assert(r("2024-01-01") == 1L)
    assert(r("2024-01-07") == 2L, "Jan 7 window [Jan 1..7] holds users 1,2")
    assert(r("2024-01-08") == 2L, "Jan 8 window [Jan 2..8] holds users 2,3")
  }

  test("repeat activity within a window is not double-counted") {
    val r = RollingDistinct.activeKeys(ev(
      ("2024-01-01 10:00:00", 1L),
      ("2024-01-02 10:00:00", 1L),
      ("2024-01-03 10:00:00", 1L)), windowDays = 7)
      .collect().map(x => x.getDate(0).toString -> x.getLong(1)).toMap
    assert(r.values.toSet == Set(1L), s"one user however often active: $r")
  }

  test("only observed days report — no phantom window-end rows") {
    val r = RollingDistinct.activeKeys(ev(
      ("2024-01-01 10:00:00", 1L)), windowDays = 7)
      .collect().map(_.getDate(0).toString)
    assert(r.toSeq == Seq("2024-01-01"),
      s"no rows for Jan 2..7 where nothing happened: ${r.toSeq}")
  }

  test("sketch path tracks exact within 3% on the driver data") {
    val events = graft.io.Sources.table(spark, "/root/testdata/sf0.01", "events")
    val exact = RollingDistinct.activeKeys(events)
      .collect().map(x => x.getDate(0).toString -> x.getLong(1)).toMap
    val approx = RollingDistinct.approxActiveKeys(events)
      .collect().map(x => x.getDate(0).toString -> x.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (d, n) =>
      val a = approx(d)
      assert(math.abs(a - n) <= math.max(2L, (n * 0.03).toLong),
        s"day $d: approx $a vs exact $n")
    }
  }
}
