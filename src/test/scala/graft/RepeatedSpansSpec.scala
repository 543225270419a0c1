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

  test("excise keeps one copy: first (doc, start) witness survives, later copies go") {
    val docs = Seq(
      (1L, s"alpha beta gamma $boiler delta epsilon"),
      (2L, s"one two three four five six $boiler"),
      (3L, "totally unique words nothing shared here at all today ok fine"))
      .toDF("doc_id", "text")
    val out = RepeatedSpans.excise(docs, w = 8, minDocs = 2)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    // doc 1 is the witness (lowest doc_id): keeps everything
    assert(out(1)._3 == 0L)
    assert(out(1)._4 == s"alpha beta gamma $boiler delta epsilon")
    // doc 2 loses the witness-protected-elsewhere tokens it can excise:
    // the two repeated 8-windows there cover the 9 boiler tokens
    assert(out(2)._3 == 9L)
    assert(out(2)._4 == "one two three four five six")
    // untouched doc passes through intact
    assert(out(3)._3 == 0L)
    assert(out(3)._4 == "totally unique words nothing shared here at all today ok fine")
  }

  test("excise removes the union of overlapping windows and protects witness overlap") {
    // 10-token shared run → three overlapping 8-windows; non-witness doc
    // removes the union (10 tokens), not 24
    val run = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
    val docs = Seq((1L, s"x $run"), (2L, s"$run y z")).toDF("doc_id", "text")
    val out = RepeatedSpans.excise(docs, w = 8, minDocs = 2)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    // grams are witnessed at their globally-first (doc, start): doc 1
    // holds every witness here, so doc 1 keeps all and doc 2 drops the run
    assert(out(1)._3 == 0L && out(1)._4 == s"x $run")
    assert(out(2)._3 == 10L && out(2)._4 == "y z")
  }

  test("excise leaves short and unique docs untouched (token-normalized)") {
    val docs = Seq((1L, "too   short"), (2L, "also quite short text"))
      .toDF("doc_id", "text")
    val out = RepeatedSpans.excise(docs, w = 8, minDocs = 2)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1)._3 == 0L && out(1)._4 == "too short")
    assert(out(2)._3 == 0L && out(2)._4 == "also quite short text")
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
