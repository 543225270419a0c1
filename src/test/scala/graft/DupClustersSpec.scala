package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.DupClusters

class DupClustersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    DupClusters.connectedComponents(edges.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap

  test("chain collapses to one component rooted at the min") {
    // 1-2-3-4-5 as a path: naive pairwise dedup sees only adjacent dups
    val got = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("disjoint components keep separate roots") {
    val got = cc(Seq((10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L), (31L, 30L)))
    assert(got == Map(
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L,
      30L -> 30L, 31L -> 30L))
  }

  test("long path converges within the iteration budget (log² rounds)") {
    val n = 200L
    val path = (1L until n).map(i => (i, i + 1))
    val got = cc(path)
    assert(got.size == n)
    assert(got.values.forall(_ == 1L))
  }

  test("matches a brute-force union-find oracle on a random graph") {
    val rnd = new scala.util.Random(42)
    val nodes = 80
    val edges = Seq.fill(70)((rnd.nextInt(nodes).toLong, rnd.nextInt(nodes).toLong))
      .filter { case (a, b) => a != b }
    // driver-side union-find
    val parent = Array.tabulate(nodes)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(v => v -> {
        // root of union-find, then min member of that root's class
        val r = find(v.toInt)
        edges.flatMap(e => Seq(e._1, e._2)).distinct
          .filter(u => find(u.toInt) == r).min
      }).toMap
    assert(cc(edges) == expected)
  }

  test("an exhausted iteration budget fails loudly instead of mislabeling") {
    val path = (1L until 50L).map(i => (i, i + 1))
    intercept[IllegalArgumentException] {
      // smallGraphEdges = -1 forces the distributed path (the budget
      // does not exist on the union-find fast path)
      DupClusters.connectedComponents(path.toDF("id_a", "id_b"), maxIter = 1,
          smallGraphEdges = -1L)
        .collect()
    }
  }

  test("distributed star-contraction and union-find fast path label identically") {
    val rnd = new scala.util.Random(11)
    val n = 300
    val edges = Seq.fill(400)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }.distinct
    val viaUnionFind = cc(edges) // below the default threshold
    val viaStars = DupClusters.connectedComponents(
      edges.toDF("id_a", "id_b"), smallGraphEdges = -1L)
      .as[(Long, Long)].collect().toMap
    assert(viaUnionFind == viaStars)
  }

  test("matches GraphX connectedComponents on a larger random graph") {
    val rnd = new scala.util.Random(7)
    val n = 500
    val edges = Seq.fill(700)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }.distinct
    // force the distributed path so GraphX keeps checking the star
    // contraction, not the union-find (the differential test above
    // ties the two paths together)
    val got = DupClusters.connectedComponents(
      edges.toDF("id_a", "id_b"), smallGraphEdges = -1L)
      .as[(Long, Long)].collect().toMap
    // independent implementation: GraphX's Pregel-based CC, normalized
    // to min-member labels
    val gx = org.apache.spark.graphx.Graph.fromEdgeTuples(
      spark.sparkContext.parallelize(edges), defaultValue = 0)
      .connectedComponents().vertices.collect().toMap
    val nodesInEdges = edges.flatMap(e => Seq(e._1, e._2)).toSet
    val gxLabels = gx.view.filterKeys(nodesInEdges).toMap
    // GraphX labels components by min vertex id too
    assert(got == gxLabels.map { case (k, v) => k -> v })
  }

  test("clusterDocuments unions isolated docs back as singletons with sizes") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 9L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val got = DupClusters.clusterDocuments(docs, pairs)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (4L, 4L, 1L), (5L, 5L, 1L), (9L, 9L, 1L)))
  }

  test("affixPairs links shared prefixes and shared suffixes") {
    val pad = "x" * 40
    val docs = Seq(
      (1L, pad + " alpha ending-one"),
      (2L, pad + " beta ending-two"),          // shares 40-prefix with 1
      (3L, "totally different start " + pad),
      (4L, "another unrelated start " + pad),  // shares 40-suffix with 3
      (5L, "no relation to anything here at all")
    ).toDF("doc_id", "text")
    val got = DupClusters.affixPairs(docs, n = 40)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (3L, 4L)))
  }

  test("q55 clusters transitively through mixed prefix/suffix links") {
    val p = "p" * 40
    val s = "s" * 40
    val docs = Seq(
      (1L, p + " mid-one " + "e1"),
      (2L, p + " mid-two " + s),   // prefix-linked to 1, suffix-linked to 3
      (3L, "start-three " + s),
      (7L, "lonely document with no twin")
    ).toDF("doc_id", "text")
    val got = DupClusters
      .clusterDocuments(docs, DupClusters.affixPairs(docs, n = 40))
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L), (7L, 7L, 1L)))
  }
}
