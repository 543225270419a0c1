package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import graft.operators.Skew
import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.Event

class SkewStatefulSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin equals the plain join result") {
    // hot key: 900 of 1000 rows share key 1
    val big = ((0 until 900).map(i => (1L, i.toLong)) ++
      (0 until 100).map(i => (2L + i % 5, 1000L + i)))
      .toDF("key", "payload")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"),
      (5L, "d"), (6L, "e")).toDF("key", "name")
    val plain = big.join(small, Seq("key")).select("key", "payload", "name")
    val salted = Skew.saltedJoin(big, small, "key", n = 8,
      saltBy = Seq("payload")).select("key", "payload", "name")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("stateful streaming sessionization matches batch Sessionize") {
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      Event(1L, ts("2024-01-01 10:00:00"), 1.0),
      Event(1L, ts("2024-01-01 10:10:00"), 2.0),
      Event(1L, ts("2024-01-01 11:30:00"), 3.0),   // new session
      Event(2L, ts("2024-01-01 10:00:00"), 4.0))
    // bounded-stream path: use the pure per-group function directly
    val (closed1, open1) = StatefulSessions.sessionsFor(
      events.filter(_.user_id == 1L).iterator, 1800L * 1000000L, 1L, None)
    assert(closed1.map(s => (s.n_events, s.total_value)) == Seq((2L, 3.0)))
    assert(open1.map(_.n) == Some(1L))
    // end-to-end through the streaming engine (file-backed stream)
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    spark.createDataset(events).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .parquet(dir)
      .as[Event]
    val got = StatefulSessions.run(spark,
      stream, gapSeconds = 1800, sinkName = "sessions_t1")
      .collect().map(s => (s.user_id, s.n_events, s.total_value)).toSet
    // closed sessions are emitted; the trailing open sessions flush via
    // event-time timeout only if a later watermark passes — with
    // AvailableNow over a static set, at least the closed one must appear
    assert(got.contains((1L, 2L, 3.0)))
  }
}
