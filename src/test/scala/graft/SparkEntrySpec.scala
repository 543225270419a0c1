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
}
