package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.functions.VectorFunctions.cosine

/** Hard-negative mining semantics: label constraint, similarity order,
  * k bound, and exactness when every vector shares one cell. */
class HardNegativesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vecs = Seq(
    (1L, Seq(1.00f, 0.00f), 0),
    (2L, Seq(0.99f, 0.14f), 0),
    (3L, Seq(0.97f, 0.24f), 1), // nearest different-label to 1 and 2
    (4L, Seq(0.00f, 1.00f), 1),
    (5L, Seq(0.10f, 0.99f), 2))
    .toDF("vec_id", "embedding", "label")
    .select(col("vec_id"), col("embedding").cast("array<float>"), col("label"))

  test("single cell: output equals brute-force different-label top-k") {
    val got = Similarity.hardNegatives(vecs, k = 2, numCentroids = 1)
      .as[(Long, Long, Double, Long)].collect().toSeq
    val brute = vecs.select(col("vec_id").as("anchor_id"),
        col("embedding").as("av"), col("label").as("al"))
      .crossJoin(vecs.select(col("vec_id").as("neg_id"),
        col("embedding").as("nv"), col("label").as("nl")))
      .filter(col("anchor_id") =!= col("neg_id") && col("al") =!= col("nl"))
      .select(col("anchor_id"), col("neg_id"),
        round(cosine(col("av"), col("nv")), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("anchor_id")
          .orderBy(col("cos_sim").desc, col("neg_id"))).cast("bigint"))
      .filter(col("rank") <= 2)
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(got.toSet == brute.toSet)
  }

  test("the hardest negative is the geometric near-miss, never same-label") {
    val got = Similarity.hardNegatives(vecs, k = 1, numCentroids = 1)
      .as[(Long, Long, Double, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(got(1L) == 3L) // label-1 vec closest to the label-0 axis
    assert(got(2L) == 3L)
    val labels = vecs.select("vec_id", "label")
      .as[(Long, Int)].collect().toMap
    val all = Similarity.hardNegatives(vecs, k = 3, numCentroids = 1)
      .as[(Long, Long, Double, Long)].collect()
    assert(all.forall(r => labels(r._1) != labels(r._2)))
    assert(all.groupBy(_._1).values.forall(_.length <= 3))
  }

  test("mining is deterministic across runs") {
    val a = Similarity.hardNegatives(vecs, k = 2).collect().toSeq
    val b = Similarity.hardNegatives(vecs, k = 2).collect().toSeq
    assert(a == b)
  }

  test("oversized cells still yield negatives via sorted neighborhood") {
    // 1 centroid + maxCell below the population forces the big-cell path
    val many = (0 until 64).map { i =>
      (i.toLong, Seq((i % 8).toFloat + 1f, (i % 3).toFloat), i % 2) }
      .toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>"),
        col("label"))
    val got = Similarity.hardNegatives(many, k = 2, numCentroids = 1,
      maxCell = 10, neighborWindow = 4)
    assert(got.count() > 0)
    val labels = many.select("vec_id", "label")
      .as[(Long, Int)].collect().toMap
    assert(got.as[(Long, Long, Double, Long)].collect()
      .forall(r => labels(r._1) != labels(r._2)))
  }
}
