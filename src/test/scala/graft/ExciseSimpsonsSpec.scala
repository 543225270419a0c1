package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Decontaminate, Simpsons}

/** Planted span-excision and Simpson-reversal cases. */
class ExciseSimpsonsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("excise: exactly the covered span goes, overlaps merge, clean docs absent") {
    val bench = Seq((100L, "the secret answer is"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // one match at tokens 3..6 of 8 -> 4 removed
      (1L, "alpha beta gamma the secret answer is delta"),
      // two OVERLAPPING matches (positions 1 and 2 via repeated
      // 'the'): 'the secret answer is' at 1, then a shifted window
      (2L, "the secret answer is the secret answer is"),
      // no match -> must not appear
      (3L, "totally clean document with enough tokens here"))
      .toDF("doc_id", "text")
    val r = Decontaminate.exciseContaminated(corpus, bench, n = 4)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(!r.contains(3L), "clean doc not reported")
    val d1 = r(1L)
    assert(d1.getLong(1) == 8L && d1.getLong(2) == 1L)
    assert(d1.getLong(3) == 4L)
    assert(d1.getString(4) == "alpha beta gamma delta")
    val d2 = r(2L)
    // matches at starts 1 and 5 cover everything
    assert(d2.getLong(3) == 8L && d2.getString(4) == "")
  }

  test("simpsons: a planted composition reversal is flagged") {
    // stratum A: treated 90% vs control 80% (treated better)
    // stratum B: treated 30% vs control 20% (treated better)
    // but treated units concentrate in B, control in A ->
    // pooled treated rate < pooled control rate: the paradox
    def unit(s: String, t: Boolean, conv: Int, n: Int) =
      (0 until n).map(i => (s, t, if (i < conv) 1.0 else 0.0))
    val units = (
      unit("A", true, 9, 10) ++ unit("A", false, 80, 100) ++
      unit("B", true, 30, 100) ++ unit("B", false, 2, 10))
      .toDF("s", "t", "y")
    val r = Simpsons.audit(units, col("s"), col("t"), col("y"))
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("A").getDouble(5) > 0 && r("B").getDouble(5) > 0,
      "both strata favor treatment")
    assert(r("ALL").getDouble(5) < 0, "pooled favors control")
    assert(!r("A").getBoolean(6) && !r("B").getBoolean(6),
      "strata flagged as disagreeing")
    assert(r("ALL").getBoolean(6), "pooled agrees with itself")
  }
}
