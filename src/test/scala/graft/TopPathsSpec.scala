package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import graft.operators.Sessionize

/** Path-mining semantics: sliding windows within a user's sequence,
  * truncated tails dropped, no path spans users, deterministic
  * (n desc, path asc) top-k. */
class TopPathsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val events = Seq(
    // user 1: a b c d  → paths a>b>c, b>c>d
    (1L, 10L, ts("2024-01-01 10:00:00"), "a"),
    (1L, 11L, ts("2024-01-01 10:01:00"), "b"),
    (1L, 12L, ts("2024-01-01 10:02:00"), "c"),
    (1L, 13L, ts("2024-01-01 10:03:00"), "d"),
    // user 2: a b c   → path a>b>c (same-ts pair: event_id orders b,c)
    (2L, 20L, ts("2024-01-01 09:00:00"), "a"),
    (2L, 21L, ts("2024-01-01 09:01:00"), "b"),
    (2L, 22L, ts("2024-01-01 09:01:00"), "c"),
    // user 3: too short for a 3-path
    (3L, 30L, ts("2024-01-01 08:00:00"), "x"),
    (3L, 31L, ts("2024-01-01 08:01:00"), "y"))
    .toDF("user_id", "event_id", "ts", "event_type")

  test("3-step windows slide within users; tails and short users drop") {
    val got = Sessionize.topPaths(events, steps = 3, topK = 10)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a>b>c", 2L), ("b>c>d", 1L)), s"$got")
  }

  test("no path crosses a user boundary") {
    val paths = Sessionize.topPaths(events, steps = 2, topK = 100)
      .as[(String, Long)].collect().toMap
    // user 1 ends at d, user 2 starts at a: d>a must not exist
    assert(!paths.contains("d>a"), s"$paths")
    assert(paths("a>b") == 2L && paths("x>y") == 1L)
  }

  test("topK ties break by path ascending") {
    val got = Sessionize.topPaths(events, steps = 3, topK = 1)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a>b>c", 2L)))
  }
}
