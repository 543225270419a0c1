package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.lake.TableLog
import graft.operators.Experiment
import graft.streaming.ExperimentMonitor
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** Streaming mSPRT monitor: stream ≡ batch regardless of micro-batch
  * boundaries, and crash replays append nothing twice. */
class ExperimentMonitorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def evRow(id: Long, user: Long, day: Int, et: String,
      v: Double) =
    (id, java.sql.Timestamp.valueOf(f"2024-05-$day%02d 10:00:00"),
      user, et, v, "{}")

  // user-days SPLIT across files: u1/day1 purchases land in both f1
  // and f2 — the dashboard must still see one unit row per user-day
  private def fileA = Seq(
    evRow(1, 1, 1, "purchase", 10.0), evRow(2, 2, 1, "purchase", 30.0),
    evRow(3, 3, 1, "purchase", 12.0), evRow(4, 4, 1, "purchase", 28.0),
    evRow(5, 1, 2, "purchase", 11.0), evRow(6, 2, 2, "purchase", 29.0),
    evRow(7, 5, 1, "view", 99.0))
  private def fileB = Seq(
    evRow(8, 1, 1, "purchase", 5.0),   // same user-day as event 1
    evRow(9, 3, 2, "purchase", 13.0), evRow(10, 4, 2, "purchase", 27.0),
    evRow(11, 5, 2, "purchase", 8.0), evRow(12, 6, 2, "purchase", 20.0))

  private def toDF(rows: Seq[(Long, java.sql.Timestamp, Long, String,
      Double, String)]) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("multi-batch stream dashboard equals the batch mSPRT, user-days re-merge") {
    val root = Files.createTempDirectory("graft_expmon")
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
    val moments = root.resolve("moments").toString
    ExperimentMonitor.monitor(spark, src.toString, "*.parquet",
      moments, root.resolve("ckpt").toString,
      maxFilesPerTrigger = Some(1))
    // two batches committed
    assert(TableLog.history(spark, moments)
      .count(_.action.startsWith("exp-")) == 2)
    val streamed = ExperimentMonitor.dashboard(spark, moments, tau = 5.0)
      .collect().map(_.toSeq).toSeq
    val batch = Experiment.sequentialMsprt(
      toDF(fileA ++ fileB).where(col("event_type") === "purchase")
        .groupBy(col("user_id"), to_date(col("ts")).as("d"))
        .agg(sum("value").as("m")),
      col("user_id") % 2 === 1, col("d"), col("m"), tau = 5.0)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch,
      "batch boundaries must not move the always-valid curve")
    // and u1/day1 really did split across batches then re-merge
    val u1 = TableLog.read(spark, moments)
      .filter(col("user_id") === 1 &&
        col("d") === java.sql.Date.valueOf("2024-05-01"))
    assert(u1.count() == 2, "the split user-day stores two increments")
  }

  test("replayed batch appends nothing") {
    val root = Files.createTempDirectory("graft_expmon_rp")
    val moments = root.resolve("m").toString
    val b = toDF(fileA)
    val first = ExperimentMonitor.ingestOnce(spark, b, moments, 7L)
    assert(first > 0)
    val v1 = TableLog.latestVersion(spark, moments)
    assert(ExperimentMonitor.ingestOnce(spark, b, moments, 7L) == 0L)
    assert(TableLog.latestVersion(spark, moments) == v1,
      "a replayed batch must not commit a second time")
  }
}
