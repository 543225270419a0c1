package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.DeflateRatio

class DeflateRatioSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ratioOf(s: String): Double =
    Seq(s).toDF("text")
      .select(DeflateRatio.deflateRatio(col("text")).as("r"))
      .as[Double].collect().head

  /** Independent reference: one-shot java.util.zip with a fresh
    * Deflater per call (the expression reuses a thread-local one —
    * reset must make that equivalent). */
  private def reference(s: String): Double = {
    val raw = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.BEST_SPEED, true)
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length * 2 + 128)
    val n = d.deflate(buf)
    d.end()
    n.toDouble / raw.length
  }

  test("degenerate repetition compresses far below normal prose") {
    val junk = ratioOf("spam " * 400)
    val prose = ratioOf(
      ("the quick brown fox jumps over the lazy dog and then wanders " +
        "through seventeen unrelated meadows describing each flower ") * 5)
    assert(junk < 0.05)
    assert(prose > junk * 3)
  }

  test("structureless input stays near its entropy bound, far above prose") {
    val rnd = new scala.util.Random(3)
    // random printable chars: uniform over 94 symbols, so the best any
    // compressor can do is log2(94)/8 ≈ 0.82 of the raw bytes — the
    // ratio must sit near that bound, nowhere near prose's ~0.5
    val noise = (1 to 400).map(_ => (33 + rnd.nextInt(94)).toChar).mkString
    val r = ratioOf(noise)
    assert(r > 0.75 && r <= 1.1)
  }

  test("empty is 1.0 by convention; null propagates") {
    assert(ratioOf("") == 1.0)
    val got = Seq[String](null).toDF("text")
      .select(DeflateRatio.deflateRatio(col("text")).as("r"))
      .collect().head
    assert(got.isNullAt(0))
  }

  test("matches a fresh one-shot Deflater on varied inputs incl. UTF-8") {
    val cases = Seq("a", "ab" * 50, "Grüße aus München — 東京 convention",
      "x" + ("yz" * 300) + "x", "tab\tand\nnewline mixed " * 20)
    cases.foreach { s =>
      assert(ratioOf(s) == reference(s), s"mismatch for: ${s.take(30)}")
    }
  }

  test("thread-local reuse across many rows stays consistent") {
    val rows = (1 to 500).map(i => ("doc " * (i % 40 + 1)) + i)
    val got = rows.toDF("text")
      .repartition(4)
      .select(col("text"), DeflateRatio.deflateRatio(col("text")).as("r"))
      .as[(String, Double)].collect().toMap
    rows.foreach { s => assert(got(s) == reference(s)) }
  }

  test("direct compute agrees with the column path") {
    val s = "interleaved interleaved interleaved text"
    assert(DeflateRatio.compute(UTF8String.fromString(s)) == ratioOf(s))
  }
}
