package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.LateAudit

/** Late-drop audit contract: the engine's dropped-by-watermark
  * counter matches exact hand-computed expectations on a controlled
  * backfill replay, and a generous watermark drops nothing. */
class LateAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // days 1-10: 3 rows/day; days 11-20: 2 rows/day; days 21-30: 1/day
  private def mkEvents() = (1 to 30).flatMap { d =>
    val n = if (d <= 10) 3 else if (d <= 20) 2 else 1
    (1 to n).map(i =>
      (d.toLong * 100 + i, f"2024-01-$d%02d 0$i:00:00", "click", 1.0))
  }.toDF("event_id", "ts_s", "event_type", "value")
    .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")

  private def staged(): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_late_spec").toString
    LateAudit.stageBackfillArrival(spark, mkEvents(), dir)
    dir
  }

  test("backfill arriving under a propagated watermark is dropped, row-exact") {
    val rows = LateAudit.auditRun(spark, staged(), watermark = "2 days")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // batch 0: days 1-10 (30 rows); batch 1: days 21-30 (10 rows,
    // advances the watermark); batch 2: days 29-30 re-delivery
    // (2 rows — deduped, lets the watermark propagate)
    assert(rows(0L) == (30L, 0L), s"got $rows")
    assert(rows(1L) == (10L, 0L), s"got $rows")
    assert(rows(2L) == (2L, 0L), s"got $rows")
    // batch 3: days 11-20 backfill (20 rows) — watermark ~day 28 now
    // operative in the filter: every row drops, counted raw
    assert(rows(3L) == (20L, 20L), s"got $rows")
  }

  test("a watermark wider than the backfill gap drops nothing") {
    val rows = LateAudit.auditRun(spark, staged(), watermark = "30 days")
      .collect()
    assert(rows.map(_.getLong(2)).sum == 0L,
      "no row should drop under a 30-day watermark")
    // 60 original rows + 2 re-delivered duplicates
    assert(rows.map(_.getLong(1)).sum == 62L)
  }

  test("staging writes four arrival files in tranche order") {
    val dir = staged()
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.lastModified())
    assert(files.length == 4, s"expected 4 tranche files, got ${files.length}")
    val first = spark.read.parquet(files.head.getPath)
    // earliest-arriving tranche is days 1-10 = 30 rows
    assert(first.count() == 30L)
  }
}
