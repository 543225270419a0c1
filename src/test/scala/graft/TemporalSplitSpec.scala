package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{HistoryDocs, TemporalSplit}

/** Temporal split + history rendering contracts on hand-built
  * streams: embargo rows belong to no split, boundaries are
  * half-open, the audit's gap check holds, and the rendered doc is
  * byte-deterministic with the line cap enforced. */
class TemporalSplitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def events(rows: (Long, Long, String, String, Double)*) =
    rows.toDF("event_id", "user_id", "ts_s", "event_type", "value")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")

  test("assignment: embargo strips a window before each boundary, half-open cuts") {
    val ev = events(
      (1L, 1L, "2024-01-10 00:00:00", "a", 1.0), // train
      (2L, 1L, "2024-01-14 12:00:00", "a", 1.0), // embargo before t1
      (3L, 1L, "2024-01-15 00:00:00", "a", 1.0), // val (at t1)
      (4L, 1L, "2024-01-22 23:00:00", "a", 1.0), // embargo before t2
      (5L, 1L, "2024-01-23 00:00:00", "a", 1.0), // test (at t2)
      (6L, 1L, "2024-01-28 00:00:00", "a", 1.0)) // test
    val m = TemporalSplit.assign(ev, "2024-01-15 00:00:00",
      "2024-01-23 00:00:00", embargoSeconds = 86400L)
      .collect().map(r => r.getAs[Long]("event_id") ->
        r.getAs[String]("split")).toMap
    assert(m == Map(1L -> "train", 2L -> "embargo", 3L -> "val",
      4L -> "embargo", 5L -> "test", 6L -> "test"), s"got $m")
  }

  test("audit: counts per split and the leakage gap check") {
    val ev = events(
      (1L, 1L, "2024-01-10 00:00:00", "a", 1.0),
      (2L, 1L, "2024-01-16 00:00:00", "a", 1.0),
      (3L, 1L, "2024-01-25 00:00:00", "a", 1.0))
    val rows = TemporalSplit.audit(ev, "2024-01-15 00:00:00",
      "2024-01-23 00:00:00", embargoSeconds = 86400L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getAs[Boolean]("gap_ok"))).toMap
    assert(rows("train") == (1L, true))
    assert(rows("val") == (1L, true))
    assert(rows("test") == (1L, true))
    assert(!rows.contains("embargo"))
  }

  test("history doc: deterministic bytes, ordered lines, md5 stable") {
    val ev = events(
      (2L, 1L, "2024-01-01 00:00:02", "view", 1.5),
      (1L, 1L, "2024-01-01 00:00:01", "click", 2.0),
      (3L, 2L, "2024-01-01 00:00:03", "view", 0.25))
    val rows = HistoryDocs.render(ev).collect()
    assert(rows.length == 2)
    val u1 = rows.find(_.getLong(0) == 1L).get
    assert(u1.getAs[Long]("n_events") == 2L)
    // expected doc for user 1, micros-rendered, time-ordered
    val us1 = java.time.Instant.parse("2024-01-01T00:00:01Z")
      .getEpochSecond * 1000000L
    val us2 = java.time.Instant.parse("2024-01-01T00:00:02Z")
      .getEpochSecond * 1000000L
    val doc = s"$us1|click|200\n$us2|view|150"
    assert(u1.getAs[Long]("n_chars") == doc.length.toLong)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(doc.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(u1.getAs[String]("doc_md5") == md)
  }

  test("history doc: maxLines caps each user's history at the earliest events") {
    val ev = events((1 to 10).map(i =>
      (i.toLong, 1L, f"2024-01-01 00:00:$i%02d", "a", 1.0)): _*)
    val r = HistoryDocs.render(ev, maxLines = 4).collect()(0)
    assert(r.getAs[Long]("n_events") == 4L)
  }
}
