package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Funnel
import graft.streaming.StreamingFunnel
import java.nio.file.Files
import scala.jdk.CollectionConverters._

class StreamingFunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private val steps = Seq("view", "click", "purchase")

  // the FunnelSpec adversarial fixture: out-of-order purchase,
  // view-only user, never-viewed user, plus an early-click race
  private lazy val events = Seq(
    (1L, ts("2024-01-01 10:00:00"), "view"),
    (1L, ts("2024-01-01 10:05:00"), "click"),
    (1L, ts("2024-01-01 10:10:00"), "purchase"),
    (2L, ts("2024-01-01 09:00:00"), "view"),
    (2L, ts("2024-01-01 08:00:00"), "purchase"),
    (2L, ts("2024-01-01 09:30:00"), "click"),
    (3L, ts("2024-01-01 11:00:00"), "view"),
    (4L, ts("2024-01-01 07:00:00"), "click"),
    (4L, ts("2024-01-01 07:30:00"), "purchase"))
    .toDF("user_id", "ts", "event_type")

  private def writeOne(dir: java.nio.file.Path, name: String,
      df: org.apache.spark.sql.DataFrame): Unit = {
    val tmp = dir.resolve(name + ".tmp")
    df.coalesce(1).write.parquet(tmp.toString)
    val part = Files.list(tmp).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.move(part, dir.resolve(name))
  }

  test("single-batch streaming funnel equals the batch funnel (shuffled input)") {
    val dir = Files.createTempDirectory("graft_sfunnel")
    // shuffle row order on disk — the processor must sort by event time
    writeOne(dir, "events.parquet", events.orderBy(md5(col("user_id").cast("string"))))
    val streamed = StreamingFunnel.funnelCounts(spark, dir.toString, steps)
      .as[(Int, String, Long)].collect().toSeq
    val batch = Funnel.funnel(events, steps)
      .as[(Int, String, Long)].collect().toSeq
    assert(streamed == batch)
    assert(streamed == Seq((1, "view", 3L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("cross-batch: time-ordered batches accumulate to the batch funnel; zero steps report") {
    val dir = Files.createTempDirectory("graft_sfunnel2")
    // split at a time boundary, older file first (in-order contract)
    val cut = ts("2024-01-01 09:15:00")
    writeOne(dir, "a_early.parquet", events.filter(col("ts") <= cut))
    Thread.sleep(10)
    writeOne(dir, "b_late.parquet", events.filter(col("ts") > cut))
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    val evs = graft.streaming.Streams.eventStream(ss, dir.toString,
        glob = "*.parquet", maxFilesPerTrigger = Some(1))
      .select(col("user_id"), col("ts"), col("event_type"))
      .as[StreamingFunnel.Ev](org.apache.spark.sql.Encoders.product)
    val completions = StreamingFunnel.run(ss, evs, steps, "sfunnel_x").toDF()
    val counts = completions.groupBy("step").agg(count(lit(1)).as("n"))
      .as[(Int, Long)].collect().toMap
    assert(counts == Map(1 -> 3L, 2 -> 2L, 3 -> 1L))
    // a step sequence nothing completes still reports zero
    val none = StreamingFunnel.funnelCounts(spark, dir.toString,
      Seq("purchase", "error", "signup"), glob = "*.parquet")
    // fixture has purchases, but none followed by error then signup
    val rows = none.as[(Int, String, Long)].collect().toSeq
    assert(rows.map(_._1) == Seq(1, 2, 3))
    assert(rows(1)._3 == 0L && rows(2)._3 == 0L)
  }
}
