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

  test("approx-sketch contract bits hold at a different SF than the gate") {
    // q52/q25 carry their epsilon-vs-exact contracts as oracled bits;
    // re-assert them here at sf0.001 so the bound isn't tuned to one SF
    val q52 = SparkEntry.queries("q52_approx_percentiles")(spark, sf).collect()
    assert(q52.nonEmpty)
    q52.foreach(r => assert(r.getInt(2) == 1 && r.getInt(3) == 1,
      s"rank contract failed: $r"))
    val q25 = SparkEntry.queries("q25_approx_users")(spark, sf).collect()
    assert(q25.nonEmpty)
    q25.foreach(r => assert(r.getInt(2) == 1, s"hll contract failed: $r"))
  }
}
