package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke-level integration: the driver contract surface. Full oracle
  * parity is exercised by graft.Verify + the driver's DuckDB compare. */
class SparkEntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has either an oracle or a documented rows-only status") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("representative queries run non-empty on sf0.001") {
    for (q <- Seq("q01_pricing_summary", "q10_merge_upsert", "q17_minhash_pairs",
        "q20_embedding_topk")) {
      assert(SparkEntry.queries(q)(spark, sf).count() > 0, s"$q was empty")
    }
  }

  test("approx percentiles track the exact ones within sketch tolerance") {
    def byType(name: String): Map[String, (Double, Double)] =
      SparkEntry.queries(name)(spark, sf).collect()
        .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = byType("q29_percentiles")
    val approx = byType("q52_approx_percentiles")
    assert(exact.keySet == approx.keySet)
    // value range is ~[0, 1000]; accuracy=1000 keeps rank error ≤ ~1/1000,
    // so a 5% value tolerance is generous and stable
    exact.foreach { case (k, (p50, p90)) =>
      val (a50, a90) = approx(k)
      assert(math.abs(a50 - p50) <= math.max(5.0, p50 * 0.05), s"$k p50 $a50 vs $p50")
      assert(math.abs(a90 - p90) <= math.max(5.0, p90 * 0.05), s"$k p90 $a90 vs $p90")
    }
  }
}
