package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.GraphAudit

/** Planted-graph semantics for the structure audits: modularity,
  * assortativity, reciprocity. Fixtures build events whose
  * navigation chains produce an exactly-known edge table (each user
  * contributes one src→dst hop via two ordered events). */
class GraphAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(m: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(2024, 1, 1).atStartOfDay.plusMinutes(m))

  /** One user per hop: events (u, t1, page=src), (u, t2, page=dst). */
  private def hops(edges: Seq[(Int, Int)]) =
    edges.zipWithIndex.flatMap { case ((s, d), u) =>
      Seq((u.toLong, ts(1), (2L * u), s"""{"k": $s}"""),
        (u.toLong, ts(2), (2L * u + 1), s"""{"k": $d}"""))
    }.toDF("user_id", "ts", "event_id", "props")

  test("modularity: within-section chains read high, cross-section low") {
    // sections (size 10): {0..9}, {10..19}. Within: hops stay inside
    // a section; cross: every hop jumps sections.
    val within = hops(Seq((1, 2), (2, 3), (3, 1), (11, 12), (12, 13),
      (13, 11)))
    val cross = hops(Seq((1, 12), (12, 2), (2, 13), (13, 3), (3, 11),
      (11, 1)))
    val qW = GraphAudit.modularity(within).collect()(0)
    val qX = GraphAudit.modularity(cross).collect()(0)
    assert(qW.getDouble(4) > 0.4, s"within Q=${qW.getDouble(4)}")
    assert(qX.getDouble(4) < 0.0, s"cross Q=${qX.getDouble(4)}")
    assert(qW.getDouble(3) == 1.0 && qX.getDouble(3) == 0.0)
    assert(qW.getLong(1) == 2L)
  }

  test("assortativity: a reciprocal star is exactly disassortative") {
    // hub 0 <-> leaves 1..5: every edge pairs degree 10 with degree
    // 2, half each direction -> the degree pairs anti-correlate with
    // r = -1 exactly. (A one-way star has CONSTANT degree on each
    // side — zero variance, r undefined — which the guard nulls.)
    val star = hops((1 to 5).flatMap(l => Seq((0, l), (l, 0))))
    val r = GraphAudit.assortativity(star).collect()(0)
    assert(r.getLong(0) == 10L)
    assert(math.abs(r.getDouble(1) - -1.0) < 1e-6,
      s"r=${r.getDouble(1)}")
    // the degenerate one-way star reads NULL, not a number
    val oneWay = GraphAudit.assortativity(
      hops((1 to 8).map(l => (0, l)))).collect()(0)
    assert(oneWay.isNullAt(1))
  }

  test("reciprocity: counts exactly the reversed pairs") {
    // a<->b reciprocated, c->d and e->f not
    val g = hops(Seq((1, 2), (2, 1), (3, 4), (5, 6)))
    val r = GraphAudit.reciprocity(g).collect()(0)
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L)
    assert(r.getDouble(4) == 0.5)
    assert(r.getDouble(5) == 0.5)
  }

  test("reciprocity: self-loops are excluded") {
    val g = hops(Seq((7, 7), (1, 2)))
    val r = GraphAudit.reciprocity(g).collect()(0)
    assert(r.getLong(0) == 1L && r.getLong(1) == 0L)
  }

  test("bfs distances: exact on a path graph, capped by maxHops") {
    // path 1—2—3—4: ecc(1)=3, sum(1)=1+2+3=6; ecc(2)=2, sum(2)=4
    val g = hops(Seq((1, 2), (2, 3), (3, 4)))
    val r = GraphAudit.bfsDistances(g).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r.size == 4)
    assert(r(1L).getLong(1) == 4L && r(1L).getLong(2) == 3L &&
      r(1L).getLong(3) == 6L)
    assert(r(2L).getLong(2) == 2L && r(2L).getLong(3) == 4L)
    assert(math.abs(r(2L).getDouble(4) - 4.0 / 3.0) < 1e-6)
    // diameter = max ecc = 3; symmetric ends agree
    assert(r.values.map(_.getLong(2)).max == 3L)
    assert(r(4L).getLong(3) == 6L)
    // cap: with maxHops = 1 node 1 reaches only itself and 2
    val c = GraphAudit.bfsDistances(g, maxHops = 1).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(c(1L).getLong(1) == 2L && c(1L).getLong(2) == 1L)
  }
}
