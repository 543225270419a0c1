package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.KCore

/** Round-wise peel equals the textbook sequential peel on seeded
  * graphs; stars collapse; cliques persist. */
class KCoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def edgesDF(es: Seq[(Int, Int)]) =
    es.map { case (a, b) => (a, b, 1L) }.toDF("src", "dst", "w")

  /** Reference: sequential min-degree peel. */
  private def bruteKCore(es: Seq[(Int, Int)], k: Int): Map[Int, Int] = {
    var adj = es.flatMap { case (a, b) if a != b =>
      Seq(a -> b, b -> a); case _ => Nil }
      .distinct.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var changed = true
    while (changed) {
      changed = false
      adj.find(_._2.size < k).foreach { case (n, _) =>
        adj = (adj - n).view.mapValues(_ - n).toMap
          .filter(_._2.nonEmpty)
        changed = true
      }
    }
    adj.map { case (n, s) => n -> s.size }
  }

  private def run(es: Seq[(Int, Int)], k: Int): Map[Int, Int] =
    KCore.kCore(edgesDF(es), k).collect()
      .map(r => r.getInt(0) -> r.getLong(1).toInt).toMap

  test("triangle + tail: the 2-core is the triangle, the tail peels") {
    val es = Seq((1, 2), (2, 3), (1, 3), (3, 4), (4, 5))
    assert(run(es, 2) == Map(1 -> 2, 2 -> 2, 3 -> 2))
    assert(run(es, 2) == bruteKCore(es, 2))
  }

  test("star hub: huge degree, empty 2-core") {
    val es = (2 to 30).map(i => (1, i))
    assert(run(es, 2).isEmpty)
  }

  test("clique survives at k = n-1; chained peel cascades fully") {
    val clique = for (a <- 1 to 5; b <- (a + 1) to 5) yield (a, b)
    // a path hanging off the clique peels node by node across rounds
    val es = clique ++ Seq((5, 10), (10, 11), (11, 12))
    val got = run(es, 4)
    assert(got == Map(1 -> 4, 2 -> 4, 3 -> 4, 4 -> 4, 5 -> 4))
    assert(got == bruteKCore(es, 4))
  }

  test("matches brute force on a seeded pseudo-random graph, k=2,3") {
    var s = 99L
    def next(m: Int) = { s = (s * 1103515245L + 12345L) & 0x7fffffffL
      (s % m).toInt }
    val es = (1 to 120).map(_ => (next(40) + 1, next(40) + 1))
      .filter { case (a, b) => a != b }
    assert(run(es, 2) == bruteKCore(es, 2))
    assert(run(es, 3) == bruteKCore(es, 3))
  }

  test("k=1 keeps every non-isolated node with its simple degree") {
    // multiplicity and direction collapse: (2,3),(2,3),(3,2) is ONE
    // simple edge, so node 3's degree is 1
    val es = Seq((1, 2), (2, 3), (2, 3), (3, 2))
    assert(run(es, 1) == Map(1 -> 1, 2 -> 2, 3 -> 1))
  }
}
