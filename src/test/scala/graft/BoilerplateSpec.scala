package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SegmentDedup

/** Boilerplate-excision semantics: the document-frequency rule is
  * per-source, kills ALL occurrences (unlike first-one-wins dedup),
  * preserves segment order on reassembly, and never loses a row. */
class BoilerplateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // source A: "nav bar" opens 3 of 4 docs (df 0.75); source B has the
  // same segment in only 1 of 2 docs (df 0.5) — per-source thresholds
  // must treat them differently at minDocFrac 0.6
  private val docs = Seq(
    (1L, "A", "nav bar alpha beta"),
    (2L, "A", "nav bar gamma delta"),
    (3L, "A", "nav bar epsilon zeta"),
    (4L, "A", "eta theta"),
    (5L, "B", "nav bar iota kappa"),
    (6L, "B", "lambda mu"))
    .toDF("doc_id", "source", "text")

  private def run(frac: Double) =
    SegmentDedup.boilerplateExcise(docs, segTokens = 2, minDocFrac = frac)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap

  test("frequent segments die in EVERY doc of their source only") {
    val out = run(0.6)
    assert(out(1L)._4 == "alpha beta" && out(1L)._3 == 1L)
    assert(out(2L)._4 == "gamma delta")
    assert(out(3L)._4 == "epsilon zeta")
    assert(out(4L)._4 == "eta theta" && out(4L)._3 == 0L)
    // source B is under ITS OWN threshold — "nav bar" survives there
    assert(out(5L)._4 == "nav bar iota kappa")
    assert(out(6L)._4 == "lambda mu")
  }

  test("reassembly preserves segment order") {
    val out = run(0.8) // above every segment's df — nothing excised
    assert(out(1L)._4 == "nav bar alpha beta")
  }

  test("an all-boilerplate doc survives with empty text") {
    val d = Seq(
      (1L, "A", "same text"), (2L, "A", "same text"), (3L, "A", "same text"))
      .toDF("doc_id", "source", "text")
    val out = SegmentDedup.boilerplateExcise(d, segTokens = 2,
      minDocFrac = 0.9).as[(Long, Long, Long, String)].collect()
    assert(out.length == 3)
    assert(out.forall(r => r._4 == "" && r._3 == r._2))
  }

  test("threshold is >= : df exactly at minDocFrac is boilerplate") {
    val out = run(0.75) // "nav bar" in A: df = 3/4 = 0.75 exactly
    assert(out(1L)._4 == "alpha beta")
    val under = run(0.76)
    assert(under(1L)._4 == "nav bar alpha beta")
  }

  test("n_segs counts every segment; totals are conserved") {
    val out = run(0.6)
    // 2-token docs yield 1 segment (docs 4, 6), 4-token docs yield 2
    assert(out.values.map(_._2).sum == 10L)
    assert(out.values.map(_._3).sum == 3L)  // nav-bar × 3 in source A
  }
}
