package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.RepeatedSpans

class RepeatedSpansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val boiler = "this license text is repeated verbatim in many files"

  test("cross-doc repeated passage is detected with exact span coverage") {
    val docs = Seq(
      (1L, s"alpha beta gamma $boiler delta epsilon"),
      (2L, s"one two three four five six $boiler"),
      (3L, "totally unique words nothing shared here at all today ok fine"))
      .toDF("doc_id", "text")
    val out = RepeatedSpans.report(docs, w = 8, minDocs = 2)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // boiler is 9 tokens → two 8-token windows fully inside it per doc,
    // plus no other window repeats
    assert(out(1)._4 == 2 && out(2)._4 == 2) // n_repeated_windows
    assert(out(1)._5 == 9 && out(2)._5 == 9) // covered = the 9 boiler tokens
    assert(out(3)._4 == 0 && out(3)._5 == 0 && out(3)._6 == 0.0)
    assert(out(1)._6 == math.rint(9.0 / out(1)._2 * 10000) / 10000)
  }

  test("within-doc repetition alone does not count (cross-document semantics)") {
    val docs = Seq(
      (1L, s"$boiler $boiler"), // repeats internally, nowhere else
      (2L, "unrelated filler content that goes on for quite a while longer"))
      .toDF("doc_id", "text")
    val out = RepeatedSpans.report(docs, w = 8, minDocs = 2)
      .filter(col("n_repeated_windows") > 0).count()
    assert(out == 0)
  }

  test("short documents report zero windows, not errors") {
    val docs = Seq((1L, "too short"), (2L, "also quite short text"))
      .toDF("doc_id", "text")
    val out = RepeatedSpans.report(docs, w = 8, minDocs = 2)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(out.forall(r => r._3 == 0 && r._4 == 0 && r._6 == 0.0))
    assert(out.length == 2)
  }

  test("overlapping repeated windows cover the union, not the sum") {
    // shared run of 10 tokens → three 8-windows per doc, union = 10 tokens
    val run = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
    val docs = Seq((1L, s"x $run"), (2L, s"$run y z")).toDF("doc_id", "text")
    val out = RepeatedSpans.report(docs, w = 8, minDocs = 2)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1)._4 == 3 && out(1)._5 == 10)
    assert(out(2)._4 == 3 && out(2)._5 == 10)
  }
}
