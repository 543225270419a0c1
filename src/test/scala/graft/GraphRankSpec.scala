package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraphRank

/** PageRank correctness on graphs small enough to hand-check: mass
  * conservation under dangling redistribution, the analytic fixpoint
  * of a symmetric 2-cycle, authority ordering on a star graph, and
  * edge extraction from the raw clickstream shape. */
class GraphRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def edges(rows: (Int, Int, Long)*) =
    rows.toDF("src", "dst", "w")

  test("rank mass is conserved (sums to 1) even with dangling nodes") {
    // 1 -> 2 -> 3, node 3 dangles
    val r = GraphRank.pagerank(spark,
      edges((1, 2, 1L), (2, 3, 1L)), iterations = 5)
    val total = r.collect().map(_.getDouble(1)).sum
    assert(math.abs(total - 1.0) < 1e-5, s"mass drifted: $total")
  }

  test("symmetric 2-cycle converges to the uniform fixpoint exactly") {
    // A <-> B: rank (0.5, 0.5) is the fixpoint from the uniform start,
    // so every iteration must reproduce it bit-for-bit.
    val r = GraphRank.pagerank(spark,
      edges((1, 2, 1L), (2, 1, 1L)), iterations = 5)
      .collect().map(x => x.getInt(0) -> x.getDouble(1)).toMap
    assert(r == Map(1 -> 0.5, 2 -> 0.5), s"got $r")
  }

  test("star graph: the hub out-ranks every leaf") {
    // leaves 2..5 all point at 1; 1 points back at 2 only
    val r = GraphRank.pagerank(spark,
      edges((2, 1, 1L), (3, 1, 1L), (4, 1, 1L), (5, 1, 1L), (1, 2, 1L)),
      iterations = 5)
      .collect().map(x => x.getInt(0) -> x.getDouble(1)).toMap
    assert(r(1) > r(2), s"hub must beat its one linked leaf: $r")
    assert(Seq(3, 4, 5).forall(l => r(2) > r(l)),
      s"linked leaf must beat unlinked leaves: $r")
    assert(r(3) == r(4) && r(4) == r(5), s"symmetric leaves must tie: $r")
  }

  test("weighted edges shift rank toward the heavier destination") {
    // 1 sends 3/4 of its mass to 2, 1/4 to 3; 2 and 3 both return to 1
    val r = GraphRank.pagerank(spark,
      edges((1, 2, 3L), (1, 3, 1L), (2, 1, 1L), (3, 1, 1L)),
      iterations = 5)
      .collect().map(x => x.getInt(0) -> x.getDouble(1)).toMap
    assert(r(2) > r(3), s"w=3 edge must out-rank w=1 edge: $r")
  }

  test("navigationEdges builds per-user transition multiplicities with tie-break order") {
    val ev = Seq(
      // user 1: pages 10 -> 20 -> 10 (two edges)
      (1L, 1L, "2024-01-01 00:00:01", """{"k": 10}"""),
      (2L, 1L, "2024-01-01 00:00:02", """{"k": 20}"""),
      (3L, 1L, "2024-01-01 00:00:03", """{"k": 10}"""),
      // user 2: same timestamp twice — event_id breaks the tie
      (4L, 2L, "2024-01-01 00:00:01", """{"k": 10}"""),
      (5L, 2L, "2024-01-01 00:00:01", """{"k": 20}"""),
      // user 3: null page is dropped, no edge across it survives
      (6L, 3L, "2024-01-01 00:00:01", """{"k": 30}"""),
      (7L, 3L, "2024-01-01 00:00:02", """{}"""),
      (8L, 3L, "2024-01-01 00:00:03", """{"k": 40}"""))
      .toDF("event_id", "user_id", "ts", "props")
      .withColumn("ts", org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.col("ts")))
    val e = GraphRank.navigationEdges(ev)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(e((10, 20)) == 2L, s"10->20 from users 1+2: $e")
    assert(e((20, 10)) == 1L)
    // null page removed BEFORE lead(): 30 -> 40 is a real transition
    assert(e((30, 40)) == 1L, s"null-page event must not break the chain: $e")
    assert(e.size == 3)
  }

  test("pagerank is deterministic across runs") {
    val ev = graft.io.Sources.table(spark, "/root/testdata/sf0.001", "events")
    val a = GraphRank.navigationRank(spark, ev).collect().toSeq
    val b = GraphRank.navigationRank(spark, ev).collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("ppr: mass conserved; rank reaches only pages downstream of seeds") {
    // two disconnected 2-cycles {1,2} and {3,4}; seed = {1}
    val r = GraphRank.personalizedRank(spark,
      edges((1, 2, 1L), (2, 1, 1L), (3, 4, 1L), (4, 3, 1L)),
      seeds = Seq(1), iterations = 6)
      .collect().map(x => x.getInt(0) -> x.getDouble(1)).toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-5)
    assert(r(3) == 0.0 && r(4) == 0.0)   // unreachable from the seed
    assert(r(1) > 0.0 && r(2) > 0.0)
  }

  test("ppr: seed proximity beats global authority") {
    // 3 is a global hub (2,4,5 -> 3), but the seed is 1 with 1 -> 2
    // only: 2 must out-rank the hub as seen from 1
    val r = GraphRank.personalizedRank(spark,
      edges((1, 2, 1L), (2, 3, 1L), (4, 3, 1L), (5, 3, 1L)),
      seeds = Seq(1), iterations = 6)
      .collect().map(x => x.getInt(0) -> x.getDouble(1)).toMap
    assert(r(2) > r(3), s"seed neighbor must beat the far hub: $r")
    assert(r(4) == 0.0 && r(5) == 0.0)   // no path from seed
  }

  test("degree profile: histogram and MLE on a hand graph") {
    // star: hub degree 4, leaves degree 1 → hist {1→4, 4→1}
    // alpha = 1 + 5 / (4·ln2 + 1·ln8)
    import org.apache.spark.sql.functions.{col, lit}
    val ev = Seq(
      (1L, 100L, "2024-01-01 10:00:00", """{"k": 0}"""),
      (2L, 100L, "2024-01-01 10:01:00", """{"k": 1}"""),
      (3L, 101L, "2024-01-01 10:00:00", """{"k": 0}"""),
      (4L, 101L, "2024-01-01 10:01:00", """{"k": 2}"""),
      (5L, 102L, "2024-01-01 10:00:00", """{"k": 0}"""),
      (6L, 102L, "2024-01-01 10:01:00", """{"k": 3}"""),
      (7L, 103L, "2024-01-01 10:00:00", """{"k": 0}"""),
      (8L, 103L, "2024-01-01 10:01:00", """{"k": 4}"""))
      .toDF("event_id", "user_id", "ts_s", "props")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val got = GraphRank.degreeProfile(ev)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val alpha = BigDecimal(1.0 + 5.0 /
      (4 * math.log(1 / 0.5) + math.log(4 / 0.5)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((4L, 0.8, alpha)))
    assert(got(4L) == ((1L, 0.2, alpha)))
  }

  test("ppr: dangling mass restarts at the seeds, not uniformly") {
    // 1 -> 2, 2 dangles; every drop of 2's mass must come back to 1
    val r = GraphRank.personalizedRank(spark,
      edges((1, 2, 1L)), seeds = Seq(1), iterations = 8)
      .collect().map(x => x.getInt(0) -> x.getDouble(1)).toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-5)
    assert(r(1) > r(2))   // restart + dangling return concentrate at 1
  }
}
