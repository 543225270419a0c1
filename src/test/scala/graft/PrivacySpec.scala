package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Privacy

/** k-anonymity semantics: class accounting, the summary's achieved-k,
  * suppression as an exact gate, banding as class coarsening. */
class PrivacySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // quasi = (region, tier); classes: (a,1)x3 same salary, (a,2)x1, (b,1)x2
  private val rows = Seq(
    ("a", 1, 100.0), ("a", 1, 100.0), ("a", 1, 100.0),
    ("a", 2, 250.0),
    ("b", 1, 100.0), ("b", 1, 900.0))
    .toDF("region", "tier", "salary")

  test("report: class sizes, l-diversity, below-k flags") {
    val r = Privacy.kAnonymityReport(rows, Seq("region", "tier"), "salary", k = 2)
      .as[(String, Int, Long, Long, Boolean)].collect().toSeq
    assert(r == Seq(
      ("a", 1, 3L, 1L, false), // large but ZERO diversity — attribute leak
      ("a", 2, 1L, 1L, true),
      ("b", 1, 2L, 2L, false)))
  }

  test("summary: achieved k, worst diversity, rows at risk") {
    val s = Privacy.anonymitySummary(rows, Seq("region", "tier"), "salary", k = 2)
      .as[(Long, Long, Long, Long)].collect().head
    assert(s == ((1L, 1L, 3L, 1L))) // min class 1, min l-div 1, 3 classes, 1 row at risk
  }

  test("suppression keeps exactly the rows of >=k classes") {
    val kept = Privacy.suppressBelowK(rows, Seq("region", "tier"), k = 2)
    assert(kept.count() == 5)
    assert(kept.filter(col("tier") === 2).count() == 0)
    // suppressed table satisfies the k it was gated at
    val s = Privacy.anonymitySummary(kept, Seq("region", "tier"), "salary", k = 2)
      .as[(Long, Long, Long, Long)].collect().head
    assert(s._1 >= 2L && s._4 == 0L)
    // k=1 is the identity gate
    assert(Privacy.suppressBelowK(rows, Seq("region", "tier"), 1).count() == 6)
  }

  test("banding coarsens the quasi-space and raises the achieved k") {
    // exact salary as a quasi-identifier: every row near-unique
    val exactK = Privacy.anonymitySummary(rows, Seq("region", "salary"), "tier", 2)
      .as[(Long, Long, Long, Long)].collect().head._1
    val banded = Privacy.bandize(rows, "salary", 1000.0, "salary_band")
    val bandK = Privacy.anonymitySummary(banded, Seq("region", "salary_band"), "tier", 2)
      .as[(Long, Long, Long, Long)].collect().head._1
    assert(bandK >= exactK)
    assert(banded.select("salary_band").distinct().count() == 1) // all < 1000
  }

  test("invalid arguments are rejected eagerly") {
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityReport(rows, Nil, "salary", 2) }
    intercept[IllegalArgumentException] {
      Privacy.suppressBelowK(rows, Seq("region"), 0) }
    intercept[IllegalArgumentException] {
      Privacy.bandize(rows, "salary", 0.0, "b") }
  }
}
