package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Diversity-aware subselection semantics: exact budget, √-sublinear
  * allocation (rare clusters keep seats), prototype (most-central)
  * picking, and salted two-phase == unsalted single-window. */
class DiverseSubsetSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // two well-separated clusters around (10,0) and (0,10), sizes 40 / 5
  private def twoClusters = {
    val rows =
      (0 until 40).map { i =>
        (i.toLong, Seq(10f + (i % 7) * 0.1f, (i % 5) * 0.1f)) } ++
      (100 until 105).map { i =>
        (i.toLong, Seq((i % 3) * 0.1f, 10f + (i % 4) * 0.1f)) }
    rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
  }
  private val cents = Array(Array(10f, 0f), Array(0f, 10f))

  test("exact budget, every cluster represented, sqrt beats proportional") {
    val out = Similarity.diverseSubsetWith(twoClusters, cents, budget = 9)
      .as[(Long, Int, Double, Int)].collect().toSeq
    assert(out.size == 9)
    val perCluster = out.groupBy(_._2).view.mapValues(_.size).toMap
    // proportional would give the size-5 cluster 1 seat (9·5/45);
    // sqrt weights √40:√5 ≈ 2.83:1 → it gets ⌈9/3.83⌉ ≈ 2-3 seats
    assert(perCluster(1) >= 2, s"$perCluster")
    assert(perCluster(0) + perCluster(1) == 9)
  }

  test("within a cluster the most-central rows win, deterministically") {
    val out = Similarity.diverseSubsetWith(twoClusters, cents, budget = 9)
      .as[(Long, Int, Double, Int)].collect().toSeq
    val c0 = out.filter(_._2 == 0)
    // chosen max distance must not exceed any unchosen row's distance
    val all0 = Similarity.assignToCentroids(twoClusters, cents)
      .filter(col("cluster_id") === 0)
    val dists = all0
      .withColumn("d", graft.functions.VectorFunctions.sqDist(
        col("embedding"), typedlit(cents(0).toSeq).cast("array<float>")))
      .select("vec_id", "d").as[(Long, Double)].collect().toMap
    val chosenMax = c0.map(r => dists(r._1)).max
    val unchosenMin = dists.view.filterKeys(k => !c0.exists(_._1 == k))
      .values.min
    assert(chosenMax <= unchosenMin,
      s"chosenMax=$chosenMax unchosenMin=$unchosenMin")
  }

  test("two-phase salted selection equals the unsalted single window") {
    val salted = Similarity.diverseSubsetWith(
      twoClusters, cents, budget = 12, salts = 8)
      .as[(Long, Int, Double, Int)].collect().toSet
    val unsalted = Similarity.diverseSubsetWith(
      twoClusters, cents, budget = 12, salts = 1)
      .as[(Long, Int, Double, Int)].collect().toSet
    assert(salted == unsalted)
  }

  test("budget >= corpus takes everything; allocation caps at size") {
    val out = Similarity.diverseSubsetWith(twoClusters, cents, budget = 1000)
      .collect()
    assert(out.length == 45)
    val alloc = Similarity.allocateSqrt(Map(0 -> 3L, 1 -> 100L), 50)
    assert(alloc(0) <= 3)
    assert(alloc.values.sum == 50)
  }

  test("allocation is deterministic and exact under scarcity") {
    val sizes = Map(0 -> 1000L, 1 -> 10L, 2 -> 10L, 3 -> 1L)
    val a = Similarity.allocateSqrt(sizes, 7)
    val b = Similarity.allocateSqrt(sizes, 7)
    assert(a == b)
    assert(a.values.sum == 7)
    assert(a.values.forall(_ >= 0))
  }

  test("end-to-end fitted path respects the budget on real-ish data") {
    val vecs = (0 until 300).map { i =>
      (i.toLong, Seq.tabulate(8)(j => ((i * 31 + j * 17) % 13).toFloat)) }
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val out = Similarity.diverseSubset(vecs, budget = 50, numCentroids = 6)
    assert(out.count() == 50)
  }
}
