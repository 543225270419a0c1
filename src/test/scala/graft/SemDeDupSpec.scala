package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Similarity

class SemDeDupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 8

  /** 6 well-separated base directions; group g has `sizes(g)` members,
    * each a tiny deterministic jitter of the base (cosine ≈ 1 within a
    * group, ≈ 0 across groups). */
  private lazy val (vectors, sizes) = {
    val sizes = Seq(4, 3, 1, 2, 1, 5)
    val rows = for {
      (n, g) <- sizes.zipWithIndex
      m <- 0 until n
    } yield {
      val base = Array.fill(dim)(0.01f)
      base(g) = 1.0f
      base((g + m) % dim) += 0.002f * (m + 1) // deterministic jitter
      ((g * 100 + m).toLong, base.toSeq)
    }
    (rows.toDF("vec_id", "embedding"), sizes)
  }

  /** Exact transitive-closure partition over all pairs at `tau`. */
  private def bruteForcePartition(tau: Double): Set[Set[Long]] = {
    val vecs = vectors.as[(Long, Seq[Float])].collect().toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val ids = vecs.keys.toSeq.sorted
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    for (i <- ids; j <- ids if i < j && cos(vecs(i), vecs(j)) >= tau)
      parent(find(i)) = find(j)
    ids.groupBy(find).values.map(_.toSet).toSet
  }

  test("one survivor per dup group; every row classified") {
    val out = Similarity.semDeDup(vectors, tau = 0.99, numCentroids = 6)
      .cache()
    assert(out.count() == sizes.sum) // every row classified
    val groups = out.groupBy("group_id")
      .agg(countDistinct("vec_id").as("n"),
        sum(when(col("keep"), 1).otherwise(0)).as("keeps"))
      .as[(Long, Long, Long)].collect()
    assert(groups.forall(_._3 == 1), s"each group keeps exactly one: ${groups.toSeq}")
    assert(groups.map(_._2).sum == sizes.sum)
    out.unpersist()
  }

  test("single cell = exact all-pairs closure (differential)") {
    val out = Similarity.semDeDup(vectors, tau = 0.99, numCentroids = 1)
      .select("vec_id", "group_id").as[(Long, Long)].collect().toMap
    val got = out.keys.groupBy(out).values.map(_.toSet).toSet
    assert(got == bruteForcePartition(0.99))
    // and with one cell the group sizes are exactly the planted ones
    assert(got.toSeq.map(_.size).sorted == sizes.sorted)
  }

  test("cell bucketing only refines the exact partition (never merges strangers)") {
    val out = Similarity.semDeDup(vectors, tau = 0.99, numCentroids = 6)
      .select("vec_id", "group_id").as[(Long, Long)].collect().toMap
    val got = out.keys.groupBy(out).values.map(_.toSet).toSet
    val exact = bruteForcePartition(0.99)
    // refinement: every produced group sits inside one exact group
    got.foreach(g =>
      assert(exact.exists(e => g.subsetOf(e)), s"group $g spans exact groups"))
  }

  test("pathological cell: identical-embedding mass stays one group with bounded pairs") {
    // 2000 identical embeddings + 20 distinct directions — the exact
    // degenerate cluster the skew cap exists for. With maxCell = 100
    // the big cell must take the sorted-neighborhood path.
    val ident = (0L until 2000L).map { i =>
      (i, Seq.fill(dim)(1.0f / math.sqrt(dim.toFloat).toFloat))
    }
    val distinct = (0 until 20).map { g =>
      val v = Array.fill(dim)(0.0f); v(g % dim) = if (g < dim) 1.0f else -1.0f
      ((10000 + g).toLong, v.toSeq)
    }
    val vecs = (ident ++ distinct).toDF("vec_id", "embedding")
    val out = Similarity.semDeDup(vecs, tau = 0.999, numCentroids = 8,
      maxCell = 100, neighborWindow = 4).cache()
    assert(out.count() == 2020)
    // the identical mass is transitively chained into ONE group that
    // keeps exactly one survivor
    val identGroups = out.filter(col("vec_id") < 2000L)
      .select("group_id").distinct().count()
    assert(identGroups == 1L, s"identical mass split into $identGroups groups")
    assert(out.filter(col("vec_id") < 2000L && col("keep")).count() == 1L)
    out.unpersist()
  }

  test("sorted-neighborhood candidate count is O(m·win), never O(m²)") {
    val m = 500
    val members = (0L until m.toLong)
      .map(i => (0L, i, Seq.fill(dim)(0.5f)))
      .toDF("cluster_id", "vec_id", "embedding")
    val win = 4
    val n = Similarity.sortedNeighborhoodPairs(members, dim, win,
      seed = 7L, idCol = "vec_id", vecCol = "embedding").count()
    assert(n <= m.toLong * win, s"$n pairs exceeds m*win = ${m * win}")
    assert(n >= m - 1, "chain pairs must at least connect the run")
  }

  test("survivor is the group member farthest from its centroid") {
    val out = Similarity.semDeDup(vectors, tau = 0.99, numCentroids = 6)
      .as[(Long, Long, Long, Double, Boolean)].collect()
    out.groupBy(_._2).values.filter(_.length > 1).foreach { grp =>
      val keeper = grp.filter(_._5)
      assert(keeper.length == 1)
      val minCos = grp.map(_._4).min
      assert(keeper.head._4 == minCos,
        s"keeper ${keeper.head} vs min centroid_cos $minCos in ${grp.toSeq}")
    }
  }
}
