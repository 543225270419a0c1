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

  test("incremental admission: store segments block, within-batch firsts keep") {
    import graft.operators.SegmentDedup
    val b1 = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val b2 = Seq(
      (10L, "a b c d e x y z w v"),  // seg0 blocked by the store
      (11L, "x y z w v"),            // dup of 10's seg1 WITHIN the batch
      (12L, "q r s t u")             // entirely fresh
    ).toDF("doc_id", "text")
    val adm1 = SegmentDedup.admitBatch(b1, None)
    assert(adm1.report.agg(org.apache.spark.sql.functions.sum("n_kept"))
      .head.getLong(0) == 2L, "first batch keeps everything")
    val adm2 = SegmentDedup.admitBatch(b2, Some(adm1.segments))
    val m = adm2.report.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m(10L) == ((2L, 1L)), "store blocks seg0, batch-first keeps seg1")
    assert(m(11L) == ((1L, 0L)), "within-batch later copy drops")
    assert(m(12L) == ((1L, 1L)))
  }

  test("incremental store grows by new distinct hashes only") {
    import graft.operators.SegmentDedup
    val b1 = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val b2 = Seq((2L, "a b c d e"), (3L, "f g h i j")).toDF("doc_id", "text")
    val adm1 = SegmentDedup.admitBatch(b1, None)
    val adm2 = SegmentDedup.admitBatch(b2, Some(adm1.segments))
    assert(adm2.segments.count() == 1L, "only the fresh segment appends")
    assert(adm2.segments.join(adm1.segments, Seq("seg_hash")).count() == 0L)
  }

  test("versioned admission persists the store across commits") {
    import graft.operators.SegmentDedup
    val root = java.nio.file.Files.createTempDirectory("graft_segstore")
      .resolve("store").toString
    val b1 = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val b2 = Seq((2L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val (_, v1) = SegmentDedup.admitVersioned(spark, root, b1)
    val (adm2, v2) = SegmentDedup.admitVersioned(spark, root, b2)
    assert(v2 > v1)
    val m = adm2.report.head
    assert((m.getLong(1), m.getLong(2)) == ((2L, 1L)),
      "commit-1 segment blocks, the new one keeps")
  }

  test("segmentation is deterministic under input reordering") {
    val shuffled = docs.orderBy(org.apache.spark.sql.functions.rand(42))
    val a = SegmentDedup.report(docs, 5).collect().toSeq
    val b = SegmentDedup.report(shuffled, 5).collect().toSeq
    assert(a == b)
  }
}
