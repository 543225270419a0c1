package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Scalar (int8) quantization for embedding retrieval — the
  * per-dimension uniform-grid compressor every vector store ships
  * before anything fancier (FAISS's SQ8; Jégou et al. PAMI 2011 use
  * it as the PQ baseline): codes are `round((x−minᵈ)/(maxᵈ−minᵈ)·255)`
  * on a per-dimension min/max grid, search is ASYMMETRIC — full-
  * precision queries against dequantized candidates — so the only
  * approximation is the candidate grid snap. Complements
  * [[ProductQuantization]] (codebook compression) and
  * [[Similarity.ivfTopK]] (pruned probing): SQ8 is what a store uses
  * when it wants 4× memory off the shelf with near-exact recall.
  *
  * Scale shape: the grid fit is one posexplode pass reduced to d
  * rows (collected — dimension-bounded, the fitCentroids precedent);
  * quantize/dequantize is map-only `transform` against literal
  * min/max arrays; search here is the exhaustive broadcast-queries
  * scan (the q20 baseline shape — sub-linear probing is
  * [[graft.operators.VectorIndex]]'s job, composable by quantizing
  * its candidate lists instead). */
object ScalarQuantization {

  /** Per-dimension (min, max) grid, collected to the driver —
    * d-bounded. */
  def fitMinMax(emb: DataFrame,
      vecCol: String = "embedding"): (Array[Double], Array[Double]) = {
    val rows = emb
      .select(posexplode(col(vecCol)).as(Seq("d", "x")))
      .withColumn("x", col("x").cast("double"))
      .groupBy("d").agg(min("x").as("mn"), max("x").as("mx"))
      .orderBy("d").collect()
    (rows.map(_.getAs[Double]("mn")), rows.map(_.getAs[Double]("mx")))
  }

  /** The dequantized (grid-snapped) vector: what the stored int8
    * codes reconstruct to. Kept as the VALUE rather than the code so
    * the snap error is visible and the search below needs no decode
    * step. Constant dimensions (max = min) snap to the constant. */
  def dequantize(vec: Column, mins: Array[Double],
      maxs: Array[Double]): Column = {
    val mnA = array(mins.map(lit): _*)
    val mxA = array(maxs.map(lit): _*)
    transform(vec, (x, i) => {
      val mn = element_at(mnA, i + 1)
      val mx = element_at(mxA, i + 1)
      when(mx === mn, mn).otherwise(
        mn + round((x.cast("double") - mn) / (mx - mn) * 255.0) *
          ((mx - mn) / 255.0))
    })
  }

  /** Exhaustive asymmetric top-k over SQ8 candidates: same output
    * contract as [[Similarity.bruteForceTopK]] `(query_id,
    * neighbor_id, cos_sim, rank)`, with `cos_sim` the full-precision-
    * query × dequantized-candidate cosine rounded to 6 decimals
    * before ranking (tie-stable across engines, the q20 rule). */
  def sq8TopK(candidates: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val (mins, maxs) = fitMinMax(candidates, vecCol)
    val c = candidates.select(col(idCol).as("neighbor_id"),
      dequantize(col(vecCol), mins, maxs).as("c_vec"))
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      transform(col(vecCol), x => x.cast("double")).as("q_vec")))
    // the native vec_dot is float-only; the dequantized side is
    // double, so use the HOF form (same left-to-right accumulation)
    def cosD(a: Column, b: Column): Column = {
      val d = sqrt(dotHof(a, a)) * sqrt(dotHof(b, b))
      when(d === 0.0d, lit(0.0d)).otherwise(dotHof(a, b) / d)
    }
    val scored = c.join(q, col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosD(col("q_vec"), col("c_vec")), 6).as("cos_sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos_sim", "rank")
      .orderBy("query_id", "rank")
  }

  /** DuckDB oracle for [[sq8TopK]] with queries `vec_id < 8`, k = 5
    * (the q320 registration): identical grid snap, list-ordered
    * cosine so both engines sum dimensions in array order. */
  val sq8OracleSql: String =
    """WITH pts AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) AS d,
      |    CAST(UNNEST(embedding) AS DOUBLE) AS x
      |  FROM embeddings),
      |mm AS (SELECT d, MIN(x) AS mn, MAX(x) AS mx
      |  FROM pts GROUP BY 1),
      |deq AS (
      |  SELECT vec_id,
      |    list(CASE WHEN mx = mn THEN mn
      |      ELSE mn + round((x - mn) / (mx - mn) * 255.0) *
      |        ((mx - mn) / 255.0) END ORDER BY d) AS v
      |  FROM pts JOIN mm USING (d) GROUP BY 1),
      |q AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      |  FROM embeddings WHERE vec_id < 8)
      |SELECT * FROM (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    ROUND(list_cosine_similarity(q.v, c.v), 6) AS cos_sim,
      |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
      |      ORDER BY ROUND(list_cosine_similarity(q.v, c.v), 6) DESC,
      |        c.vec_id) AS rank
      |  FROM q JOIN deq c ON c.vec_id <> q.vec_id)
      |WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin
}
