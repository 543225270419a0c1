package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.lake.TableLog
import graft.operators.Scd
import graft.streaming.ScdStream

/** Streaming SCD2 upkeep contract: per-batch merges converge to the
  * batch build, and a replayed batch id is a no-op commit. */
class ScdStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private def feedBatch(rows: (Long, String, Long, Int)*) =
    rows.toDF("user_id", "ts_s", "event_id", "attr_in")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")

  test("two in-order batches converge to the full rebuild; replay no-ops") {
    val dim = tmp("scd_stream_dim")
    val b0 = feedBatch(
      (1L, "2024-01-01 00:00:00", 0L, 10),
      (1L, "2024-01-03 00:00:00", 1L, 20),
      (2L, "2024-01-02 00:00:00", 2L, 5))
    val b1 = feedBatch(
      (1L, "2024-01-06 00:00:00", 3L, 30),
      (3L, "2024-01-05 00:00:00", 4L, 7))

    val v0 = ScdStream.applyBatchOnce(spark, b0, 0L, dim, "user_id",
      col("attr_in"))
    val v1 = ScdStream.applyBatchOnce(spark, b1, 1L, dim, "user_id",
      col("attr_in"))
    assert(v0 >= 0 && v1 > v0)

    // replaying batch 1 (checkpoint recovery) must not commit again
    val replay = ScdStream.applyBatchOnce(spark, b1, 1L, dim, "user_id",
      col("attr_in"))
    assert(replay == -1)
    assert(TableLog.history(spark, dim).count(_.action.startsWith("scd2-")) == 2)

    val streamed = TableLog.read(spark, dim)
      .select("user_id", "attr", "valid_from", "valid_to", "is_current")
      .orderBy("user_id", "valid_from").collect().toSeq
    val full = Scd.scd2Build(b0.unionByName(b1), "user_id", col("attr_in"))
      .select("user_id", "attr", "valid_from", "valid_to", "is_current")
      .orderBy("user_id", "valid_from").collect().toSeq
    assert(streamed == full,
      s"streamed\n${streamed.mkString("\n")}\nvs full\n${full.mkString("\n")}")
  }

  test("end-to-end monitor run matches the batch dimension on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val streamed = ScdStream.streamedTierDimension(spark, dir)
      .collect().toSeq
    val batch = Scd.userTierDimension(
      graft.io.Sources.table(spark, dir, "events")).collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      "in-order streamed upkeep must converge to the batch build")
  }
}
