package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{KMeans, Similarity}

class KMeansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 3 well-separated blobs in 4-d, 20 points each, deterministic. */
  private def blobs = {
    val centers = Seq(
      Array(10f, 0f, 0f, 0f), Array(0f, 10f, 0f, 0f), Array(0f, 0f, 10f, 10f))
    val rows = for {
      (c, ci) <- centers.zipWithIndex
      i <- 0 until 20
    } yield {
      val jitter = Array.tabulate(4)(j => ((i * 7 + j * 13 + ci * 29) % 10) / 20.0f - 0.25f)
      ((ci * 100 + i).toLong, c.zip(jitter).map { case (a, b) => a + b }, ci)
    }
    rows.toDF("vec_id", "embedding", "true_cluster")
  }

  test("recovers well-separated blobs exactly") {
    val df = blobs
    val model = KMeans.fit(df, k = 3, maxIter = 10)
    assert(model.k == 3 && model.dim == 4)
    val assigned = KMeans.assign(df, model)
      .join(df.select("vec_id", "true_cluster"), "vec_id")
    // every true blob maps to exactly one fitted cluster, bijectively
    val mapping = assigned.groupBy("true_cluster")
      .agg(countDistinct("cluster_id").as("n"))
      .select(max("n")).head().getLong(0)
    assert(mapping == 1L)
    val distinctFit = assigned.select("cluster_id").distinct().count()
    assert(distinctFit == 3L)
    // cluster sizes are the blob sizes
    val sizes = assigned.select("cluster_size").distinct().as[Long].collect().toSeq
    assert(sizes == Seq(20L))
  }

  test("Lloyd cost trace is non-increasing (refinement over the sample fit)") {
    val df = blobs
    val model = KMeans.fit(df, k = 5, maxIter = 6, tol = 0.0)
    assert(model.costTrace.nonEmpty)
    model.costTrace.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + 1e-9, s"cost rose: $a -> $b")
      case _ =>
    }
  }

  test("fitted centroids approximate the true blob means") {
    val df = blobs
    val model = KMeans.fit(df, k = 3, maxIter = 10)
    val trueMeans = Seq(
      Array(10.0, 0.0, 0.0, 0.0), Array(0.0, 10.0, 0.0, 0.0), Array(0.0, 0.0, 10.0, 10.0))
    trueMeans.foreach { tm =>
      val best = model.centroids.map { c =>
        c.zip(tm).map { case (a, b) => (a - b) * (a - b) }.sum
      }.min
      assert(best < 1.0, s"no centroid near ${tm.toSeq}: best sq-dist $best")
    }
  }

  test("empty clusters keep their previous centroid; k stays stable") {
    // k far above the natural cluster count forces empty cells
    val df = blobs
    val model = KMeans.fit(df, k = 12, maxIter = 4, tol = 0.0)
    assert(model.k == 12)
    assert(model.centroids.forall(_.length == 4))
  }

  test("assignment agrees with the Similarity sample-codebook assignment shape") {
    val df = blobs
    val model = KMeans.fit(df, k = 3, maxIter = 0) // 0 iters == sample codebook
    val viaSimilarity = Similarity
      .assignToCentroids(df, Similarity.fitCentroids(df, 3))
      .select(col("vec_id"), col("cluster_id").cast("bigint").as("cluster_id"))
    val viaModel = KMeans.assign(df, model).select("vec_id", "cluster_id")
    assert(viaModel.except(viaSimilarity).isEmpty && viaSimilarity.except(viaModel).isEmpty)
  }
}
