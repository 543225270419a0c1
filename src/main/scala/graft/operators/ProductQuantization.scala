package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.NearestCentroids.nearestCentroids
import graft.functions.PqAdc.pqAdc

/** Product quantization for billion-scale ANN (Jégou/Douze/Schmid,
  * "Product quantization for nearest neighbor search", TPAMI 2011).
  *
  * PQ is the memory story at 100 TB: a d-dim float vector (d·4 bytes)
  * compresses to m subspace codes (m bytes at k ≤ 256), a 32× reduction
  * for d=64/m=8 — the difference between an embedding corpus that fits
  * in cluster RAM and one that doesn't. Search quality degrades
  * gracefully and is tunable via (m, k).
  *
  * Scale shape:
  *  - TRAIN: per-subspace Lloyd on a bounded deterministic sample
  *    (driver-side; m codebooks of k×(d/m) floats — tiny).
  *  - ENCODE: map-only — `slice` the vector per subspace and take the
  *    codegen'd broadcast-codebook argmin
  *    ([[graft.functions.NearestCentroids]]); no join, no shuffle,
  *    regardless of corpus size.
  *  - SEARCH (ADC): per query, an m×k distance table is computed
  *    driver-side and broadcast-joined to the encoded corpus; each
  *    candidate costs m table lookups ([[graft.functions.PqAdc]],
  *    codegen) instead of d float ops. One scan of the code table
  *    scores ALL queries; top-k per query via the standard window.
  */
object ProductQuantization {

  /** `codebooks(j)(c)` = centroid c of subspace j, each of `subDim`
    * floats; flat row-major per subspace for the assignment kernel. */
  final case class Model(m: Int, k: Int, subDim: Int,
      codebooks: Array[Array[Array[Float]]]) {
    def dim: Int = m * subDim
  }

  /** Train per-subspace codebooks on the deterministic bounded sample
    * (same sampling contract as [[Similarity.fitCentroids]]). */
  def fit(vectors: DataFrame, m: Int = 8, k: Int = 16,
      sampleSize: Int = 4096, iters: Int = 6,
      idCol: String = "vec_id", vecCol: String = "embedding"): Model = {
    require(m >= 1 && k >= 2, "need m >= 1 subspaces and k >= 2 centroids")
    val sample = vectors
      .select(col(vecCol), xxhash64(col(idCol)).as("__h"))
      .orderBy(col("__h"))
      .limit(math.max(k, sampleSize))
      .select(col(vecCol))
      .collect()
      .map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "empty vector table")
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val subDim = dim / m
    val books = Array.tabulate(m) { j =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, j * subDim, (j + 1) * subDim))
      Similarity.lloydOnSample(sub, math.min(k, sub.length), iters)
    }
    Model(m, k, subDim, books)
  }

  /** Encode every vector to its m subspace codes — map-only. */
  def encode(vectors: DataFrame, model: Model,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val codeCols: Seq[Column] = (0 until model.m).map { j =>
      nearestCentroids(
        slice(col(vecCol), j * model.subDim + 1, model.subDim),
        model.codebooks(j), nprobe = 1).getItem(0)
    }
    vectors.select(col(idCol), array(codeCols: _*).as("pq_codes"))
  }

  /** Squared-L2 distance table for one query, flattened row-major:
    * `table(j*k + c) = |q_sub_j − codebook_j(c)|²`. */
  private def distanceTable(q: Array[Float], model: Model): Array[Float] = {
    val t = new Array[Float](model.m * model.k)
    var j = 0
    while (j < model.m) {
      var c = 0
      while (c < model.k) {
        val cent = model.codebooks(j)(math.min(c, model.codebooks(j).length - 1))
        var d = 0.0
        var i = 0
        while (i < model.subDim) {
          val diff = q(j * model.subDim + i) - cent(i)
          d += diff * diff
          i += 1
        }
        t(j * model.k + c) = d.toFloat
        c += 1
      }
      j += 1
    }
    t
  }

  /** ADC top-k: approximate squared-L2 nearest candidates per query.
    * `encoded` is the (id, pq_codes) table from [[encode]] — at scale
    * it is the thing you persist instead of the raw vectors. */
  def topK(encoded: DataFrame, queries: DataFrame, model: Model, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val qRows = queries.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])].collect()
    val tables = qRows.map { case (qid, qv) =>
      (qid, distanceTable(qv, model))
    }.toSeq.toDF("query_id", "dist_table")
    val scored = encoded
      .join(broadcast(tables), col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        round(pqAdc(col("pq_codes"), col("dist_table"), model.k), 6).as("approx_sq_dist"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("approx_sq_dist"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "approx_sq_dist", "rank")
      .orderBy("query_id", "rank")
  }
}
