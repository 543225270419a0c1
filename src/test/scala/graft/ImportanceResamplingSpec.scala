package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ImportanceResampling

/** DSIR weight semantics: target-like documents out-weigh
  * corpus-typical ones, token-less docs report 0, the selected flag
  * respects k with ties inclusive, and weights are deterministic. */
class ImportanceResamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("documents made of target tokens out-weigh documents of corpus-only tokens") {
    // target speaks {aa bb}; corpus background speaks {xx yy}
    val corpus = Seq(
      (1L, "aa bb aa bb"),   // pure target vocabulary
      (2L, "xx yy xx yy"),   // pure background
      (3L, "aa bb xx yy"))   // mixed
      .toDF("doc_id", "text")
    val target = Seq((100L, "aa bb aa bb aa bb")).toDF("doc_id", "text")
    val w = ImportanceResampling.selectTopK(corpus, target, k = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w(1L) > w(3L) && w(3L) > w(2L), s"ordering wrong: $w")
  }

  test("selected flags exactly the top-k under distinct weights") {
    val corpus = Seq(
      (1L, "aa aa aa"), (2L, "aa xx yy"), (3L, "xx yy zz"))
      .toDF("doc_id", "text")
    val target = Seq((100L, "aa aa")).toDF("doc_id", "text")
    val sel = ImportanceResampling.selectTopK(corpus, target, k = 1)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(sel == Map(1L -> true, 2L -> false, 3L -> false), s"$sel")
  }

  test("token-less documents weigh 0 and still report") {
    val corpus = Seq((1L, "aa bb"), (2L, "   ")).toDF("doc_id", "text")
    val target = Seq((100L, "aa")).toDF("doc_id", "text")
    val rows = ImportanceResampling.selectTopK(corpus, target, k = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows.keySet == Set(1L, 2L))
    assert(rows(2L) == 0.0)
  }

  test("driver-data run is deterministic and selects k docs (ties aside)") {
    val docs = graft.io.Sources.table(spark, "/root/testdata/sf0.001",
      "documents")
    val a = ImportanceResampling.englishTopK(docs, k = 50).collect()
    val b = ImportanceResampling.englishTopK(docs, k = 50).collect()
    assert(a.toSeq == b.toSeq)
    val nSel = a.count(_.getBoolean(2))
    assert(nSel >= 50, s"threshold is ties-inclusive, got $nSel")
    assert(nSel <= 60, s"far more than k selected — tie handling broken: $nSel")
  }
}
