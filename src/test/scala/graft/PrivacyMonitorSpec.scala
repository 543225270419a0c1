package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.lake.TableLog
import graft.operators.Privacy
import graft.streaming.PrivacyMonitor

/** Streaming anonymity monitor contract: per-batch report equals the
  * batch audit, replay no-ops, multi-batch runs append one row per
  * batch. */
class PrivacyMonitorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private def batch(rows: (String, Int, Long)*) =
    rows.toDF("event_type", "day", "user_id")

  test("per-batch report equals the batch audit; replay no-ops") {
    val report = tmp("anon_report")
    val b = batch(
      ("click", 1, 1L), ("click", 1, 2L), ("click", 1, 3L),
      ("view", 1, 1L), ("view", 1, 1L)) // class of 2, 1 distinct user
    val v = PrivacyMonitor.reportOnce(spark, b, report,
      Seq("event_type", "day"), "user_id", k = 3, batchId = 0L)
    assert(v >= 0)
    assert(PrivacyMonitor.reportOnce(spark, b, report,
      Seq("event_type", "day"), "user_id", k = 3, batchId = 0L) == -1,
      "replayed batch must no-op")

    val got = TableLog.read(spark, report)
      .select("k_anonymity", "l_diversity_min", "n_classes",
        "rows_at_risk").collect()(0)
    val want = Privacy.anonymitySummary(b, Seq("event_type", "day"),
      "user_id", 3).collect()(0)
    assert(got.getLong(0) == want.getLong(0)) // k = 2
    assert(got.getLong(0) == 2L)
    assert(got.getLong(1) == 1L) // view class has 1 distinct user
    assert(got.getLong(2) == 2L)
    assert(got.getLong(3) == 2L) // the size-2 class is below k=3
  }

  test("multi-batch monitor appends one summary row per batch") {
    val report = tmp("anon_report2")
    PrivacyMonitor.reportOnce(spark,
      batch(("a", 1, 1L), ("a", 1, 2L)), report,
      Seq("event_type", "day"), "user_id", k = 2, batchId = 0L)
    PrivacyMonitor.reportOnce(spark,
      batch(("b", 2, 9L)), report,
      Seq("event_type", "day"), "user_id", k = 2, batchId = 1L)
    val rows = TableLog.read(spark, report)
      .orderBy("batch_id").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[Long]("batch_id")).toSeq == Seq(0L, 1L))
    // batch 1's lone row is a k=1 class, all rows at risk
    assert(rows(1).getAs[Long]("k_anonymity") == 1L)
    assert(rows(1).getAs[Long]("rows_at_risk") == 1L)
  }

  test("end-to-end stream over sf0.001 equals the batch audit") {
    val dir = "/root/testdata/sf0.001"
    val streamed = PrivacyMonitor.eventAnonymityStream(spark, dir)
      .collect()
    assert(streamed.length == 1, "bounded single-batch run = one row")
    val ev = graft.io.Sources.table(spark, dir, "events")
      .withColumn("day", dayofmonth(col("ts")))
    val want = Privacy.anonymitySummary(ev, Seq("event_type", "day"),
      "user_id", 20).collect()(0)
    val got = streamed(0)
    assert(got.getAs[Long]("k_anonymity") == want.getAs[Long]("k_anonymity"))
    assert(got.getAs[Long]("n_classes") == want.getAs[Long]("n_classes"))
    assert(got.getAs[Long]("rows_at_risk") == want.getAs[Long]("rows_at_risk"))
  }
}
