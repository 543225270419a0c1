package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SegmentDedup

/** First-occurrence semantics of cross-document segment dedup: the
  * winner is the lexicographic min of (doc_id, seg_id), so duplicates
  * drop whether they recur in a LATER doc or later in the SAME doc,
  * and tail segments shorter than the window are real segments. */
class SegmentDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b c d e f g h i j"),   // segs: [a b c d e] [f g h i j]
    (2L, "a b c d e x y z w v"),   // seg0 duplicates doc1 seg0
    (3L, "f g h i j"),             // whole doc duplicates doc1 seg1
    (4L, "p q r s t p q r s t"),   // seg1 duplicates seg0 WITHIN the doc
    (5L, "a b c")                  // short tail: distinct from "a b c d e"
  ).toDF("doc_id", "text")

  private lazy val rows =
    SegmentDedup.report(docs, segTokens = 5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("first occurrence keeps, later docs drop") {
    assert(rows(1L) == ((2L, 2L)), "doc1 owns both its segments")
    assert(rows(2L) == ((2L, 1L)), "doc2's first segment is doc1's")
    assert(rows(3L) == ((1L, 0L)), "doc3 is entirely doc1 boilerplate")
  }

  test("within-doc repetition drops the later seg_id") {
    assert(rows(4L) == ((2L, 1L)))
  }

  test("short tail segment is its own distinct segment") {
    assert(rows(5L) == ((1L, 1L)), "'a b c' != 'a b c d e'")
  }

  test("kept_ratio is the per-doc surviving fraction") {
    val r = SegmentDedup.report(docs, segTokens = 5)
      .filter("doc_id = 2").select("kept_ratio").head.getDouble(0)
    assert(r == 0.5)
  }

  test("segmentation is deterministic under input reordering") {
    val shuffled = docs.orderBy(org.apache.spark.sql.functions.rand(42))
    val a = SegmentDedup.report(docs, 5).collect().toSeq
    val b = SegmentDedup.report(shuffled, 5).collect().toSeq
    assert(a == b)
  }
}
