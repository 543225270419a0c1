package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * The IVF (inverted-file) structure follows the public formulation of
  * Jégou/Douze/Schmid ("Product quantization for nearest neighbor
  * search", TPAMI 2011) minus the PQ compression: coarse-quantize to
  * centroids, probe the nprobe nearest cells.
  *
  * Two tiers, per the north-star contract:
  *  - `bruteForceTopK`: exact cosine top-k — the correctness baseline.
  *    The query set is broadcast, so the big side streams once with no
  *    shuffle; cost is O(|candidates|·|queries|·dim) flops inside
  *    codegen'd higher-order functions.
  *  - `ivfTopK`: IVF-style scale path — candidates are bucketed by
  *    nearest centroid (one broadcast join), queries probe only the
  *    `nprobe` nearest centroid buckets, so the pairwise work drops by
  *    ~|centroids|/nprobe. Centroids are a deterministic sample of the
  *    data (vec_id stride), standing in for a k-means fit.
  */
object Similarity {

  /** Exact cosine top-k: for each query vector, the `k` most similar
    * candidate vectors (excluding itself). */
  def bruteForceTopK(candidates: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("q_vec")))
    val c = candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val scored = c.join(q, col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("q_vec"), col("c_vec")), 6).as("cos_sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos_sim", "rank")
      .orderBy("query_id", "rank")
  }

  /** Deterministic centroid sample: every `stride`-th vector. */
  def sampleCentroids(vectors: DataFrame, stride: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    vectors.filter(col(idCol) % stride === 0)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("centroid"))

  /** Assign each vector to its nearest centroid (broadcast join +
    * window argmin — the IVF partition step). */
  def assignToCentroids(vectors: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val scored = vectors.crossJoin(broadcast(centroids))
      .withColumn("d", sqDist(col(vecCol), col("centroid")))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("d"), col("centroid_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col(vecCol), col("centroid_id").as("cluster_id"))
  }

  /** IVF ANN top-k: probe the `nprobe` closest centroid buckets per
    * query, brute-force only within them. Approximate (recall < 1 when
    * the true neighbor lives in an unprobed bucket) but the per-query
    * candidate set shrinks from |N| to ~|N|·nprobe/|centroids|. */
  def ivfTopK(vectors: DataFrame, queries: DataFrame, k: Int,
      stride: Int = 50, nprobe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val centroids = sampleCentroids(vectors, stride, idCol, vecCol)
    val assigned = assignToCentroids(vectors, centroids, idCol, vecCol)
    // queries → their nprobe nearest clusters
    val qScored = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .crossJoin(broadcast(centroids))
      .withColumn("d", sqDist(col("q_vec"), col("centroid")))
    val wq = Window.partitionBy("query_id").orderBy(col("d"), col("centroid_id"))
    val probes = qScored.withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("q_vec"), col("centroid_id").as("cluster_id"))
    val scored = assigned.join(broadcast(probes), Seq("cluster_id"))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        round(cosine(col("q_vec"), col(vecCol)), 6).as("cos_sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos_sim", "rank")
      .orderBy("query_id", "rank")
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, bucketed via the
    * IVF assignment so only same-cluster pairs are compared (near-dups
    * land in the same cluster with high probability). */
  def embeddingNearDups(vectors: DataFrame, threshold: Double,
      stride: Int = 50,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val centroids = sampleCentroids(vectors, stride, idCol, vecCol)
    val assigned = assignToCentroids(vectors, centroids, idCol, vecCol)
    val a = assigned.select(col("cluster_id"),
      col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = assigned.select(col("cluster_id"),
      col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.join(b, Seq("cluster_id"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", round(cosine(col("v_a"), col("v_b")), 6))
      .filter(col("cos_sim") >= threshold)
      .select("id_a", "id_b", "cos_sim")
      .orderBy("id_a", "id_b")
  }
}
