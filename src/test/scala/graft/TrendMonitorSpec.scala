package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.lake.TableLog
import graft.operators.Regression
import graft.streaming.TrendMonitor
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** Streaming trend monitor: stream ≡ batch regardless of micro-batch
  * boundaries (days split across batches re-merge), replays append
  * nothing. */
class TrendMonitorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def evRow(id: Long, day: Int, et: String, v: Double) =
    (id, java.sql.Timestamp.valueOf(f"2024-06-$day%02d 10:00:00"),
      1L, et, v, "{}")

  // day 2 of type "a" is SPLIT across the two files — the dashboard
  // must still fit over one daily row
  private def fileA = Seq(
    evRow(1, 1, "a", 10.0), evRow(2, 2, "a", 7.0),
    evRow(3, 1, "b", 5.0), evRow(4, 3, "b", 6.0))
  private def fileB = Seq(
    evRow(5, 2, "a", 13.0), evRow(6, 3, "a", 30.0),
    evRow(7, 2, "b", 5.5), evRow(8, 4, "a", 40.0))

  private def toDF(rows: Seq[(Long, java.sql.Timestamp, Long, String,
      Double, String)]) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("multi-batch stream dashboard equals the batch OLS") {
    val root = Files.createTempDirectory("graft_trendmon")
    val src = root.resolve("src")
    Files.createDirectories(src)
    def writeOne(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val tmp = root.resolve(name + ".tmp")
      df.coalesce(1).write.parquet(tmp.toString)
      val part = Files.list(tmp).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      Files.move(part, src.resolve(name))
    }
    writeOne("f1.parquet", toDF(fileA))
    writeOne("f2.parquet", toDF(fileB))
    val daily = root.resolve("daily").toString
    TrendMonitor.monitor(spark, src.toString, "*.parquet",
      daily, root.resolve("ckpt").toString, maxFilesPerTrigger = Some(1))
    assert(TableLog.history(spark, daily)
      .count(_.action.startsWith("trend-")) == 2)
    val streamed = TrendMonitor.dashboard(spark, daily)
      .collect().map(_.toSeq).toSeq
    val batch = Regression.olsTrend(toDF(fileA ++ fileB))
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch,
      "batch boundaries must not move the fitted trend")
    // the split day really stores two increments that re-merge
    val a2 = TableLog.read(spark, daily)
      .filter(col("event_type") === "a" &&
        col("d") === java.sql.Date.valueOf("2024-06-02"))
    assert(a2.count() == 2)
  }

  test("streaming Holt dashboard equals the batch fold over revenue dailies") {
    val root = Files.createTempDirectory("graft_trendmon_holt")
    val daily = root.resolve("d").toString
    assert(TrendMonitor.ingestOnce(spark, toDF(fileA), daily, 0L) > 0)
    assert(TrendMonitor.ingestOnce(spark, toDF(fileB), daily, 1L) > 0)
    val streamed = TrendMonitor.holtDashboard(spark, daily)
      .collect().map(_.toSeq).toSeq
    val batch = graft.operators.Forecast.holtFromDaily(
      toDF(fileA ++ fileB)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(sum("value").as("y")))
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch,
      "the split day must re-merge before the fold")
  }

  test("replayed batch appends nothing") {
    val root = Files.createTempDirectory("graft_trendmon_rp")
    val daily = root.resolve("d").toString
    val b = toDF(fileA)
    assert(TrendMonitor.ingestOnce(spark, b, daily, 3L) > 0)
    val v1 = TableLog.latestVersion(spark, daily)
    assert(TrendMonitor.ingestOnce(spark, b, daily, 3L) == 0L)
    assert(TableLog.latestVersion(spark, daily) == v1)
  }
}
