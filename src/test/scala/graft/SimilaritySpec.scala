package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{NearestCentroids, VectorFunctions}
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.99f, 0.1f, 0.0f)),   // near-dup of 0
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 1.0f)),
    (50L, Array(0.7f, 0.7f, 0.0f)))
    .toDF("vec_id", "embedding")

  test("cosine in double precision") {
    val r = spark.range(1).select(
      round(VectorFunctions.cosine(
        array(lit(1.0f), lit(2.0f)), array(lit(2.0f), lit(1.0f))), 4))
      .collect()(0).getDouble(0)
    assert(r == 0.8)
  }

  test("brute-force top-k finds the planted neighbor first") {
    val got = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0), k = 2)
      .as[(Long, Long, Double, Int)].collect()
    assert(got.head._2 == 1L)                 // nearest neighbor of 0 is 1
    assert(got.head._3 > 0.99)
    assert(got.map(_._4).toSeq == Seq(1, 2))  // ranks are dense
  }

  test("nearest-centroids expression matches a reference argmin") {
    // codebook: unit axes; every vector must map to the axis it leans to
    val cents = Array(
      Array(1.0f, 0.0f, 0.0f),
      Array(0.0f, 1.0f, 0.0f),
      Array(0.0f, 0.0f, 1.0f))
    val got = vecs.select($"vec_id",
      NearestCentroids.nearestCentroids($"embedding", cents, nprobe = 1)
        .getItem(0).as("c"))
      .as[(Long, Int)].collect().toMap
    assert(got(0L) == 0 && got(1L) == 0 && got(2L) == 1 && got(3L) == 2)
    // nprobe=2 returns distinct cells in ascending-distance order
    val probes = vecs.filter($"vec_id" === 50L)
      .select(NearestCentroids.nearestCentroids($"embedding", cents, nprobe = 2))
      .as[Seq[Int]].collect().head
    assert(probes.length == 2 && probes.toSet.subsetOf(Set(0, 1)))
  }

  test("nearest-centroids ties resolve to the lower centroid index") {
    val cents = Array(Array(1.0f, 0.0f), Array(1.0f, 0.0f)) // identical cells
    val one = Seq((0L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
      .select(NearestCentroids.nearestCentroids($"embedding", cents, 1).getItem(0))
      .as[Int].collect().head
    assert(one == 0)
  }

  test("centroid assignment puts near-dups in the same cluster") {
    // k=2 on 5 points: Lloyd must converge the two near-identical
    // vectors into one cell regardless of which points seed the init
    val cents = Similarity.fitCentroids(vecs, k = 2, sampleSize = 5, iters = 3)
    val assigned = Similarity.assignToCentroids(vecs, cents)
      .select("vec_id", "cluster_id").as[(Long, Int)].collect().toMap
    assert(assigned(0L) == assigned(1L))
  }

  test("assignment plan is map-only: no shuffle, no join") {
    val cents = Similarity.fitCentroids(vecs, k = 3, sampleSize = 5, iters = 1)
    val plan = Similarity.assignToCentroids(vecs, cents)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment shuffled:\n$plan")
    assert(!plan.toLowerCase.contains("join"), s"assignment joined:\n$plan")
  }

  test("embeddingNearDups finds the planted pair at high threshold") {
    val got = Similarity.embeddingNearDups(vecs, threshold = 0.95, numCentroids = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((0L, 1L)))
  }

  test("IVF recall@5 vs brute force is measurably high on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = e.filter($"vec_id" < 20)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.bruteForceTopK(e, queries, k = 5))
    val approx = pairs(Similarity.ivfTopK(e, queries, k = 5,
      numCentroids = 10, nprobe = 4))
    val recall = exact.intersect(approx).size.toDouble / exact.size
    // uniformly random vectors are IVF's worst case (no cluster
    // structure to exploit) — the floor documents that even then,
    // probing 4 of 10 cells keeps recall well above the 4/10 that
    // random cell assignment would give
    assert(recall >= 0.5, s"recall@5 was $recall")
    assert(approx.forall { case (q, n) => q != n })
  }

  test("NaN embeddings assign to distinct cells, never -1 sentinels") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import graft.functions.NearestCentroids
    val cents = Array.tabulate(3 * 4)(i => i.toFloat)  // 3 centroids, dim 4
    val nan = new GenericArrayData(
      Array(Float.NaN, 1.0f, 2.0f, 3.0f).map(x => x: Any))
    val out = NearestCentroids.compute(nan, cents, dim = 4, nprobe = 2)
    assert(out.forall(_ >= 0) && out.distinct.length == out.length)
  }

  test("embedding dedup pipeline collapses chains transitively to one canonical") {
    // chain: 10 ≈ 11 ≈ 12 (adjacent pairs very near; endpoints less so),
    // plus an unrelated vector that must stay its own singleton
    val base = Array.tabulate(64)(i => math.sin(i * 0.7).toFloat)
    def nudge(v: Array[Float], at: Int): Array[Float] = {
      val c = v.clone(); c(at) = c(at) + 0.08f; c
    }
    val b1 = nudge(base, 0)
    val b2 = nudge(b1, 1)
    val other = Array.tabulate(64)(i => math.cos(i * 1.3).toFloat)
    val df = Seq((10L, base), (11L, b1), (12L, b2), (50L, other))
      .toDF("vec_id", "embedding")
    val got = Similarity.embeddingDedupPipeline(df, threshold = 0.99, dim = 64)
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      (10L, 10L, true), (11L, 10L, false), (12L, 10L, false),
      (50L, 50L, true)))
  }

  test("hyperplane signature: identical vectors collide, negation flips every bit") {
    import graft.functions.HyperplaneSignature
    val df = Seq(
      (1L, Array(0.5f, -0.25f, 0.75f, 0.1f)),
      (2L, Array(0.5f, -0.25f, 0.75f, 0.1f)),     // identical
      (3L, Array(-0.5f, 0.25f, -0.75f, -0.1f)))   // negated
      .toDF("vec_id", "embedding")
      .select($"vec_id", HyperplaneSignature
        .hyperplaneSignature($"embedding", numBits = 64, dim = 4, seed = 7L)
        .as("sig"))
    val sigs = df.as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(2L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) == 64)
  }

  test("hyperplane near-dups: planted perturbed copies found with high recall, exact precision") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter($"vec_id" < 500).select($"vec_id", $"embedding")
    val perturbed = e.select(($"vec_id" + 100000L).as("vec_id"),
      concat(array(lit(0.0f)), slice($"embedding", 2, 63)).as("embedding"))
    val all = e.unionByName(perturbed)
    val got = Similarity.hyperplaneNearDups(all, threshold = 0.9, dim = 64)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // exact pairs ≥ 0.9 are exactly the (v, v-without-dim0) plants here
    val a = all.select($"vec_id".as("id_a"), $"embedding".as("v_a"))
    val b = all.select($"vec_id".as("id_b"), $"embedding".as("v_b"))
    val exact = a.crossJoin(b).filter($"id_a" < $"id_b")
      .withColumn("cos_sim", round(VectorFunctions.cosine($"v_a", $"v_b"), 6))
      .filter($"cos_sim" >= 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.subsetOf(exact), s"non-near pairs emitted: ${got.diff(exact).take(5)}")
    assert(exact.nonEmpty)
    val recall = got.size.toDouble / exact.size
    assert(recall >= 0.9, s"hyperplane recall was $recall (${got.size}/${exact.size})")
    // deterministic end-to-end (seeded planes)
    val again = Similarity.hyperplaneNearDups(all, threshold = 0.9, dim = 64)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(again == got)
  }

  /** Binds q45 (bucketed, rows-only) to q22 (exact, DuckDB-oracled):
    * same input slice, same threshold and codebook size as the driver
    * queries at the correctness-gate SF, so the rows-only query's
    * output is pinned against the oracled one's pair set. */
  test("q45 bucketed near-dups vs q22 exact pairs at sf0.01: superset precision, recall floor") {
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .filter($"vec_id" < 500)
    // exact pairs above threshold (the q22 oracle shape)
    val a = e.select($"vec_id".as("id_a"), $"embedding".as("v_a"))
    val b = e.select($"vec_id".as("id_b"), $"embedding".as("v_b"))
    val exact = a.crossJoin(b).filter($"id_a" < $"id_b")
      .withColumn("cos_sim",
        round(VectorFunctions.cosine($"v_a", $"v_b"), 6))
      .filter($"cos_sim" >= 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val bucketed = Similarity.embeddingNearDups(e, threshold = 0.4, numCentroids = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // precision is exact by construction: every emitted pair re-computed
    // true cosine, so bucketed ⊆ exact must hold with NO exceptions
    assert(bucketed.subsetOf(exact),
      s"bucketed emitted non-pairs: ${bucketed.diff(exact).take(5)}")
    val recall =
      if (exact.isEmpty) 1.0 else bucketed.size.toDouble / exact.size
    // deterministic at this SF (fixed data, deterministic codebook):
    // 32 of q22's 59 oracled pairs — pairs split across cells are the
    // documented recall trade
    assert(recall >= 0.5, s"bucketed recall was $recall (${bucketed.size}/${exact.size})")
  }
}
