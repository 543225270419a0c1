package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Communities

/** Label-propagation correctness on hand-checkable graphs: two
  * cliques joined by a weak bridge must split into two communities,
  * the tie rule must pick the smallest label, symmetrization must
  * merge directed duplicates, and the output must partition the node
  * set exactly. */
class CommunitiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def edges(rows: (Int, Int, Long)*) =
    rows.toDF("src", "dst", "w")

  private def run(e: org.apache.spark.sql.DataFrame, iters: Int = 4) =
    Communities.labelPropagation(spark, e, iters)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap

  test("two triangles joined by one weak bridge split into two communities") {
    // triangle {1,2,3} and {10,11,12}, bridge 3-10 with weight 1
    val tri = Seq((1, 2, 5L), (2, 3, 5L), (1, 3, 5L),
      (10, 11, 5L), (11, 12, 5L), (10, 12, 5L), (3, 10, 1L))
    val m = run(edges(tri: _*))
    assert(m(1) == m(2) && m(2) == m(3), s"left clique split: $m")
    assert(m(10) == m(11) && m(11) == m(12), s"right clique split: $m")
    assert(m(1) != m(10), s"bridge merged the cliques: $m")
  }

  test("ties go to the smallest label (deterministic)") {
    // node 5 sees labels {1, 9} with equal weight; must adopt 1.
    // After iter 1 on path 1-5-9: l(5)=1 (tie, min), l(1)=5, l(9)=5.
    val m = run(edges((1, 5, 2L), (5, 9, 2L)), iters = 1)
    assert(m(5) == 1, s"tie must break to min label: $m")
  }

  test("directed duplicates merge: a->b w=2 plus b->a w=3 is one undirected 5-edge") {
    val u = Communities.undirected(edges((1, 2, 2L), (2, 1, 3L)))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(u == Set((1, 2, 5L), (2, 1, 5L)), s"got $u")
  }

  test("self-loops are dropped and cannot freeze a node's label") {
    // 7 has a heavy self-loop but its only real neighborhood is the
    // {1,2,3} triangle; without the self-vote it must join it. (The
    // triangle keeps the graph non-bipartite — synchronous LPA
    // 2-cycles on bipartite structures by design.)
    val m = run(edges((7, 7, 100L), (1, 7, 1L),
      (1, 2, 3L), (2, 3, 3L), (1, 3, 3L)))
    assert(m(7) == m(1), s"self-loop froze the label: $m")
    assert(Set(m(1), m(2), m(3)).size == 1, s"triangle split: $m")
  }

  test("output partitions the node set: every node exactly once, csize consistent") {
    val e = edges((1, 2, 1L), (2, 3, 1L), (4, 5, 6L), (5, 6, 6L))
    val rows = Communities.labelPropagation(spark, e, 4).collect()
    assert(rows.map(_.getInt(0)).toSet == Set(1, 2, 3, 4, 5, 6))
    assert(rows.length == 6, "a node appeared twice")
    val byCommunity = rows.groupBy(_.getInt(1))
    byCommunity.foreach { case (c, members) =>
      assert(members.forall(_.getLong(2) == members.length),
        s"csize mismatch for community $c")
    }
  }

  test("oracle SQL embeds the same iteration count as the engine default") {
    val sql = Communities.oracleSql()
    assert(sql.contains("l4") && !sql.contains("l5"))
    assert(sql.contains("ORDER BY wt DESC, label ASC"))
  }
}
